"""Config system: YAML + ``_BASE_CONFIG_`` inheritance + dotted-key overrides.

Re-implements the config surface of the reference (``pcdet/config.py``):
  * ``cfg_from_yaml_file(path, cfg)``      -- load a yaml into the global cfg,
    honouring a single-level ``_BASE_CONFIG_`` include.
  * ``cfg_from_list(['K.SUB', 'val'...])`` -- dotted-key overrides with type
    coercion against the existing value.
  * global ``cfg`` EasyDict-style object with ``ROOT_DIR``/``LOCAL_RANK``.

The reference depends on the external ``easydict`` package; we ship a small
attribute-dict with the same ergonomics (attribute get/set that recurses into
nested dicts) so the yaml config surface is preserved verbatim.
"""
from pathlib import Path

import yaml


class EasyDict(dict):
    """dict subclass with attribute access, recursively applied."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        d = dict(d, **kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(v):
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            return EasyDict(v)
        if isinstance(v, (list, tuple)):
            return type(v)(EasyDict._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, EasyDict._wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __delattr__(self, k):
        del self[k]

    def __deepcopy__(self, memo):
        import copy
        return EasyDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


class StaticConfig:
    """Opaque (non-dict) config wrapper for flax module fields.

    flax converts dict-valued dataclass fields to FrozenDict, destroying
    EasyDict attribute access; wrapping keeps the config static and intact.
    Supports attribute access, item access, ``get`` and ``in``.
    """

    def __init__(self, d):
        object.__setattr__(self, '_d', d)

    def __getattr__(self, k):
        try:
            return self._d[k]
        except KeyError:
            raise AttributeError(k)

    def __getitem__(self, k):
        return self._d[k]

    def __contains__(self, k):
        return k in self._d

    def get(self, k, default=None):
        return self._d.get(k, default)

    def __repr__(self):
        return f'StaticConfig({self._d!r})'

    def __eq__(self, other):
        return isinstance(other, StaticConfig) and self._d == other._d

    def __hash__(self):
        return id(self._d)


def log_config_to_file(cfg_, pre='cfg', logger=None):
    for key, val in cfg_.items():
        if isinstance(val, EasyDict):
            logger.info('----------- %s -----------' % key)
            log_config_to_file(val, pre=pre + '.' + key, logger=logger)
            continue
        logger.info('%s.%s: %s' % (pre, key, val))


def cfg_from_list(cfg_list, config):
    """Set config keys via list (e.g., from command line) with type coercion.

    Mirrors reference ``pcdet/config.py:16-48``: values are parsed with
    ``literal_eval`` when possible and coerced to the type of the existing
    value; missing intermediate keys are created.
    """
    from ast import literal_eval
    assert len(cfg_list) % 2 == 0
    for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = k.split('.')
        d = config
        for subkey in key_list[:-1]:
            if subkey not in d:
                d[subkey] = EasyDict()
            d = d[subkey]
        subkey = key_list[-1]
        try:
            value = literal_eval(v)
        except (ValueError, SyntaxError):
            value = v

        if subkey in d and isinstance(d[subkey], type(value)) is False and d[subkey] is not None:
            if isinstance(d[subkey], list) and isinstance(value, str):
                # e.g. --set KEY "a,b,c"
                value = value.split(',')
            elif not isinstance(value, type(d[subkey])):
                try:
                    value = type(d[subkey])(value)
                except (TypeError, ValueError):
                    pass
        d[subkey] = value


def merge_new_config(config, new_config):
    """Recursive merge; handles ``_BASE_CONFIG_`` include (reference :51-69)."""
    if '_BASE_CONFIG_' in new_config:
        base_path = Path(new_config['_BASE_CONFIG_'])
        if not base_path.exists():
            # reference resolves relative to tools/; support running anywhere
            alt = cfg.ROOT_DIR / 'tools' / base_path
            base_path = alt if alt.exists() else base_path
        with open(base_path, 'r') as f:
            yaml_config = yaml.safe_load(f)
        config.update(EasyDict(yaml_config))

    for key, val in new_config.items():
        if key == '_BASE_CONFIG_':
            continue
        if not isinstance(val, dict):
            config[key] = val
            continue
        if key not in config:
            config[key] = EasyDict()
        merge_new_config(config[key], val)

    return config


def cfg_from_yaml_file(cfg_file, config):
    with open(cfg_file, 'r') as f:
        new_config = yaml.safe_load(f)
        merge_new_config(config=config, new_config=new_config)
    return config


cfg = EasyDict()
cfg.ROOT_DIR = (Path(__file__).resolve().parent / '../').resolve()
cfg.LOCAL_RANK = 0
