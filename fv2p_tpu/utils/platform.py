"""Opt-in platform override for the CLI tools.

The environment's sitecustomize pins ``jax_platforms='axon,cpu'`` (remote
TPU). Setting ``FV2P_PLATFORM=cpu`` (or ``cpu:8`` for 8 virtual host
devices) forces the tools onto the host CPU — the same dance
``tests/conftest.py`` does — which is useful when the TPU tunnel is flaky
or for debugging full-size programs off-device. No effect when the variable
is unset.
"""
import os


def apply_platform_override():
    """Call before the first jax device use in an entry point."""
    spec = os.environ.get('FV2P_PLATFORM')
    if not spec:
        return None
    platform, _, count = spec.partition(':')
    if platform == 'cpu' and count:
        flags = os.environ.get('XLA_FLAGS', '')
        if 'xla_force_host_platform_device_count' not in flags:
            os.environ['XLA_FLAGS'] = (
                flags + f' --xla_force_host_platform_device_count={count}'
            ).strip()
    import jax
    jax.config.update('jax_platforms', platform)
    return platform
