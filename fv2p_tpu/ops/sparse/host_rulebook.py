"""Host-side (numpy) rulebook construction for the sparse backbone.

The rulebook is integer bookkeeping that depends only on voxel coordinates —
exactly the kind of work the reference does natively per batch
(``spconv_ops.h:28-141``). On TPU, sorts/scatters are the slowest primitives
(~70 ms/scan when built on device), while numpy's C searchsorted/unique do
the same job in a few ms inside a dataloader worker, fully overlapped with
device compute. This module builds all tables for a backbone's topology per
sample; ``collate_rulebooks`` merges per-sample tables into the batch layout
(per-sample row blocks, one shared zero-pad row at the end).

Row convention per level L with capacity C_L: sample b's voxels occupy rows
[b*C_L, b*C_L + n_b); the global zero row is B*C_L (gather sentinel).
"""
import itertools

import numpy as np

INVALID = np.iinfo(np.int32).max


def _as3(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def level_capacities(base_capacity):
    """Default fixed per-sample capacities for levels 1..4 + conv_out.

    A stride-2 sparse conv can dilate an ISOLATED voxel into up to 8 output
    cells, but LiDAR voxels lie on connected surfaces whose cells mostly
    MERGE when the resolution halves. Measured on ray-cast surface scans
    (utils/lidar_sim.py, HDL-64-like geometry, 16-17k voxels on the KITTI
    0.05 m grid): x_conv2 <= 1.08x, x_conv3 <= 0.61x, x_conv4 <= 0.28x,
    out <= 0.25x the input count. The defaults below carry 25-45% margin
    over those maxima. They are NOT worst-case bounds — sprinkle-like
    occupancy (isolated cells) dilates 3-5x — so ``strict`` rulebook builds
    RAISE on overflow (the reference's spconv is fully dynamic and never
    truncates, ``include/spconv/spconv_ops.h:28-141``) and configs override
    via MODEL.BACKBONE_3D.LEVEL_CAPACITIES when their data needs more.
    """
    c = base_capacity
    # +256 additive headroom so tiny inputs (unit tests, near-empty scans,
    # whose few isolated voxels do dilate ~8x/level) clear the multiplier
    return {'x_conv1': c, 'x_conv2': int(1.4 * c) + 256,
            'x_conv3': int(0.85 * c) + 256, 'x_conv4': int(0.42 * c) + 256,
            'out': int(0.36 * c) + 256}


def select_mode_caps(caps_override, training):
    """Resolve an optional per-mode LEVEL_CAPACITIES layout.

    A flat ``{level: rows}`` dict applies to both modes. A nested
    ``{'train': {...}, 'test': {...}}`` dict (either key optional) selects
    by mode — needed when the dataset's train/test voxel caps differ (e.g.
    KITTI 16000 train / 40000 test), since a flat override sized for one
    mode is either overflowing or 2.5x oversized for the other. A missing
    mode key means "use the derived defaults".

    A dict mixing mode keys WITH flat level keys is rejected: the yaml
    ``_BASE_CONFIG_`` recursive merge produces exactly that shape when a
    child config pins flat caps over a base's nested per-mode caps, and
    silently preferring the mode keys would discard the child's pins
    (the base's caps win and the pin is a no-op). Child configs must pin
    nested ``{'train': ..., 'test': ...}`` so their mode keys shadow the
    base's after the merge."""
    if not caps_override:
        return None
    has_mode = 'train' in caps_override or 'test' in caps_override
    flat_keys = set(caps_override) - {'train', 'test'}
    if has_mode and flat_keys:
        raise ValueError(
            'LEVEL_CAPACITIES mixes per-mode keys with flat level keys '
            f'({sorted(flat_keys)}): a _BASE_CONFIG_ merge of flat child '
            'pins over nested base caps produces this and would silently '
            'discard the pins. Express the child override as nested '
            "{'train': {...}, 'test': {...}}.")
    if has_mode:
        return caps_override.get('train' if training else 'test')
    return caps_override


def backbone_spec(backbone_name, grid_size, voxel_capacity,
                  caps_override=None, strict=True):
    """Static conv topology of a backbone: list of level dicts.

    grid_size: (nx, ny, nz) of the voxel grid (sparse z = nz + 1).
    Capacities follow ``level_capacities`` (per-sample); ``caps_override``
    (dict level -> rows) replaces individual entries. ``strict`` makes
    ``build_sample_rulebooks`` raise on capacity overflow instead of
    silently truncating (the reference never truncates).
    """
    assert backbone_name in ('VoxelResBackBone8x', 'VoxelBackBone8x',
                             'UNetV2'), backbone_name
    nx, ny, nz = grid_size
    caps = level_capacities(voxel_capacity)
    if caps_override:
        caps.update({k: int(v) for k, v in caps_override.items()})
    shape1 = (nz + 1, ny, nx)
    return {
        'levels': ['x_conv1', 'x_conv2', 'x_conv3', 'x_conv4', 'out'],
        'caps': caps,
        'shapes': {'x_conv1': shape1},   # downstream shapes derived below
        'downs': [
            ('x_conv1', 'x_conv2', 3, 2, 1),
            ('x_conv2', 'x_conv3', 3, 2, 1),
            ('x_conv3', 'x_conv4', 3, 2, (0, 1, 1)),
            ('x_conv4', 'out', (3, 1, 1), (2, 1, 1), 0),
        ],
        'subm_levels': ['x_conv1', 'x_conv2', 'x_conv3', 'x_conv4'],
        'strict': bool(strict),
    }


def _out_shape(shape, kernel, stride, padding):
    kd, kh, kw = _as3(kernel)
    sd, sh, sw = _as3(stride)
    pd, ph, pw = _as3(padding)
    d, h, w = shape
    return ((d + 2 * pd - kd) // sd + 1, (h + 2 * ph - kh) // sh + 1,
            (w + 2 * pw - kw) // sw + 1)


def _encode(z, y, x, shape):
    d, h, w = shape
    return ((y.astype(np.int64) * w + x) * d + z)


def _taps(kernel):
    kd, kh, kw = _as3(kernel)
    return np.array(list(itertools.product(range(kd), range(kh), range(kw))),
                    dtype=np.int64)


def _subm_table(coords, n_valid, shape, cap, kernel=3):
    """coords: (n_valid, 3) int (z, y, x) sorted by key. -> (K, cap) int32
    with sentinel == cap."""
    d, h, w = shape
    kd, kh, kw = _as3(kernel)
    center = np.array([kd // 2, kh // 2, kw // 2], np.int64)
    rel = _taps(kernel) - center                         # (K, 3)
    k = rel.shape[0]
    keys = _encode(coords[:, 0], coords[:, 1], coords[:, 2], shape)

    z = coords[None, :, 0] + rel[:, 0:1]
    y = coords[None, :, 1] + rel[:, 1:2]
    x = coords[None, :, 2] + rel[:, 2:3]
    ok = ((z >= 0) & (z < d) & (y >= 0) & (y < h) & (x >= 0) & (x < w))
    q = _encode(z, y, x, shape)
    pos = np.searchsorted(keys, q.ravel()).reshape(k, -1)
    pos = np.clip(pos, 0, max(n_valid - 1, 0))
    found = ok & (keys[pos] == q) if n_valid > 0 else np.zeros_like(ok)
    table = np.where(found, pos, cap).astype(np.int32)
    out = np.full((k, cap), cap, np.int32)
    out[:, :n_valid] = table
    return out


def _down_tables(coords, n_valid, shape, kernel, stride, padding, out_cap):
    """Returns (out_coords (m, 3), m, table (K, out_cap)) for a strided conv."""
    kd, kh, kw = _as3(kernel)
    sd, sh, sw = _as3(stride)
    pd, ph, pw = _as3(padding)
    d, h, w = shape
    od, oh, ow = _out_shape(shape, kernel, stride, padding)
    taps = _taps(kernel)

    z_num = coords[None, :, 0] + pd - taps[:, 0:1]
    y_num = coords[None, :, 1] + ph - taps[:, 1:2]
    x_num = coords[None, :, 2] + pw - taps[:, 2:3]
    oz, oy, ox = z_num // sd, y_num // sh, x_num // sw
    ok = ((z_num % sd == 0) & (y_num % sh == 0) & (x_num % sw == 0)
          & (oz >= 0) & (oz < od) & (oy >= 0) & (oy < oh)
          & (ox >= 0) & (ox < ow))
    cand = _encode(oz, oy, ox, (od, oh, ow))[ok]
    out_keys = np.unique(cand)
    n_total = len(out_keys)
    m = min(n_total, out_cap)
    out_keys = out_keys[:m]

    o_z = (out_keys % od).astype(np.int64)
    col = out_keys // od
    o_x = col % ow
    o_y = col // ow
    out_coords = np.stack([o_z, o_y, o_x], axis=1)

    # gather table from the output side
    in_keys = _encode(coords[:, 0], coords[:, 1], coords[:, 2], shape)
    iz = out_coords[None, :, 0] * sd - pd + taps[:, 0:1]
    iy = out_coords[None, :, 1] * sh - ph + taps[:, 1:2]
    ix = out_coords[None, :, 2] * sw - pw + taps[:, 2:3]
    okk = ((iz >= 0) & (iz < d) & (iy >= 0) & (iy < h)
           & (ix >= 0) & (ix < w))
    q = _encode(iz, iy, ix, shape)
    pos = np.searchsorted(in_keys, q.ravel()).reshape(q.shape)
    pos = np.clip(pos, 0, max(n_valid - 1, 0))
    found = okk & (in_keys[pos] == q) if n_valid > 0 else np.zeros_like(okk)
    cap_in = None  # filled by caller offsetting
    table = np.where(found, pos, -1).astype(np.int32)  # -1 == sentinel marker
    k = taps.shape[0]
    out = np.full((k, out_cap), -1, np.int32)
    out[:, :m] = table
    return out_coords.astype(np.int32), m, out, n_total


_NATIVE = None


def _load_native():
    """Build/load the C++ rulebook builder (native_rulebook.cpp); returns the
    ctypes lib or None. Mirrors the reference's native indice construction
    (pcdet/ops/spconv/src/indice.cc) — ~20x faster than the numpy path."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE if _NATIVE is not False else None
    import ctypes
    import subprocess
    from pathlib import Path
    here = Path(__file__).resolve().parent
    src = here / 'native_rulebook.cpp'
    lib_path = here / 'native_rulebook.so'
    try:
        if (not lib_path.exists()
                or lib_path.stat().st_mtime < src.stat().st_mtime):
            subprocess.check_call(['g++', '-O3', '-shared', '-fPIC',
                                   str(src), '-o', str(lib_path)])
        lib = ctypes.CDLL(str(lib_path))
        lib.build_rulebooks.restype = None
        _NATIVE = lib
        return lib
    except Exception:
        _NATIVE = False
        return None


def _build_sample_rulebooks_native(voxel_coords_zyx, n_valid, spec, lib):
    import ctypes
    caps_d = spec['caps']
    levels = spec['levels']
    downs = spec['downs']
    shape1 = spec['shapes']['x_conv1']
    caps = np.array([caps_d[l] for l in levels], np.int32)
    subm_flags = np.array([1 if l in spec['subm_levels'] else 0
                           for l in levels], np.uint8)
    dp = np.array([list(_as3(k)) + list(_as3(s)) + list(_as3(p))
                   for _, _, k, s, p in downs], np.int32)
    kvols = [int(np.prod(_as3(k))) for _, _, k, s, p in downs]

    coords = np.ascontiguousarray(
        voxel_coords_zyx[:n_valid].astype(np.int32))
    subm_sz = sum(27 * caps_d[l] for l in spec['subm_levels'])
    down_sz = sum(kv * caps_d[downs[i][1]] for i, kv in enumerate(kvols))
    inv_sz = sum(kv * caps_d[downs[i][0]] for i, kv in enumerate(kvols))
    coords_sz = sum(3 * caps_d[d] for _, d, *_ in downs)
    subm_buf = np.empty(subm_sz, np.int32)
    down_buf = np.empty(down_sz, np.int32)
    inv_buf = np.empty(inv_sz, np.int32)
    coords_buf = np.empty(coords_sz, np.int32)
    nvalid_buf = np.empty(len(levels), np.int32)
    ntotal_buf = np.empty(len(levels), np.int32)

    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    shape_arr = np.array(shape1, np.int32)
    lib.build_rulebooks(
        coords.ctypes.data_as(i32p), ctypes.c_int32(int(n_valid)),
        shape_arr.ctypes.data_as(i32p), ctypes.c_int32(len(downs)),
        dp.ctypes.data_as(i32p), caps.ctypes.data_as(i32p),
        subm_flags.ctypes.data_as(u8p), subm_buf.ctypes.data_as(i32p),
        down_buf.ctypes.data_as(i32p), inv_buf.ctypes.data_as(i32p),
        coords_buf.ctypes.data_as(i32p), nvalid_buf.ctypes.data_as(i32p),
        ntotal_buf.ctypes.data_as(i32p))

    out = {'coords_x_conv1': _pad_coords(voxel_coords_zyx, caps_d['x_conv1']),
           'nvalid_x_conv1': int(n_valid)}
    o = 0
    for l in spec['subm_levels']:
        out[f'subm_{l}'] = subm_buf[o:o + 27 * caps_d[l]].reshape(
            27, caps_d[l])
        o += 27 * caps_d[l]
    od = oi = oc = 0
    level_shape = {'x_conv1': shape1}
    for i, (src, dst, k, s, p) in enumerate(downs):
        kv = kvols[i]
        out[f'down_{src}->{dst}'] = down_buf[od:od + kv * caps_d[dst]].reshape(
            kv, caps_d[dst])
        od += kv * caps_d[dst]
        out[f'down_inv_{src}->{dst}'] = inv_buf[oi:oi + kv * caps_d[src]].reshape(
            kv, caps_d[src])
        oi += kv * caps_d[src]
        out[f'coords_{dst}'] = coords_buf[oc:oc + 3 * caps_d[dst]].reshape(
            caps_d[dst], 3)
        oc += 3 * caps_d[dst]
        out[f'nvalid_{dst}'] = int(nvalid_buf[i + 1])
        out[f'ntotal_{dst}'] = int(ntotal_buf[i + 1])
        level_shape[dst] = _out_shape(level_shape[src], k, s, p)
    out['shapes'] = level_shape
    out['ntotal_x_conv1'] = int(n_valid)
    return out


def build_sample_rulebooks(voxel_coords_zyx, n_valid, spec):
    """All backbone tables for ONE sample.

    Args:
        voxel_coords_zyx: (cap1, 3) int32, FIRST n_valid rows valid and the
            sample's voxels must already be in z-last key order.
        spec: from ``backbone_spec``.
    Returns dict of numpy arrays (local row indices; -1 == missing neighbor):
        subm_<lvl>: (27, cap_lvl); down_<src>-><dst>: (K, cap_dst);
        coords_<lvl>: (cap_lvl, 3); nvalid_<lvl>: int.
    """
    lib = _load_native()
    if lib is not None:
        out = _build_sample_rulebooks_native(voxel_coords_zyx, n_valid,
                                             spec, lib)
        _check_strict(out, spec)
        return out

    caps = spec['caps']
    shape = spec['shapes']['x_conv1']
    out = {}
    coords = voxel_coords_zyx[:n_valid].astype(np.int64)
    out['coords_x_conv1'] = _pad_coords(voxel_coords_zyx, caps['x_conv1'])
    out['nvalid_x_conv1'] = n_valid
    out['ntotal_x_conv1'] = n_valid

    level_coords = {'x_conv1': coords}
    level_shape = {'x_conv1': shape}
    level_nv = {'x_conv1': n_valid}

    for lvl in spec['subm_levels']:
        if lvl == 'x_conv1':
            tab = _subm_table(coords, n_valid, shape, caps[lvl])
            tab = np.where(tab == caps[lvl], -1, tab)
            out[f'subm_{lvl}'] = tab

    for src, dst, k, s, p in spec['downs']:
        src_c = level_coords[src]
        src_shape = level_shape[src]
        oc, m, table, n_total = _down_tables(src_c, level_nv[src], src_shape,
                                             k, s, p, caps[dst])
        out[f'down_{src}->{dst}'] = table
        # inverse table for the scatter-free conv backward:
        # inv[k, i] = o with table[k, o] = i (unique per tap)
        kk = table.shape[0]
        inv = np.full((kk, caps[src]), -1, np.int32)
        for ki in range(kk):
            valid_o = table[ki] >= 0
            inv[ki, table[ki][valid_o]] = np.nonzero(valid_o)[0]
        out[f'down_inv_{src}->{dst}'] = inv
        dst_shape = _out_shape(src_shape, k, s, p)
        level_coords[dst] = oc.astype(np.int64)
        level_shape[dst] = dst_shape
        level_nv[dst] = m
        out[f'coords_{dst}'] = _pad_coords(oc, caps[dst])
        out[f'nvalid_{dst}'] = m
        out[f'ntotal_{dst}'] = n_total
        if dst in spec['subm_levels']:
            tab = _subm_table(oc.astype(np.int64), m, dst_shape, caps[dst])
            tab = np.where(tab == caps[dst], -1, tab)
            out[f'subm_{dst}'] = tab

    out['shapes'] = {lvl: level_shape[lvl] for lvl in level_shape}
    _check_strict(out, spec)
    return out


def _check_strict(sample_out, spec):
    """Raise on level-capacity overflow when the spec is strict.

    Truncation silently drops a contiguous spatial region (rows past the cap
    in sorted key order) — the reference's spconv never truncates, so strict
    is the default; opt out per-spec for tests that exercise the truncation
    path."""
    if not spec.get('strict', False):
        return
    over = {lvl: (int(sample_out[f'ntotal_{lvl}']), spec['caps'][lvl])
            for lvl in spec['levels']
            if sample_out.get(f'ntotal_{lvl}') is not None
            and int(sample_out[f'ntotal_{lvl}']) > spec['caps'][lvl]}
    if over:
        raise RuntimeError(
            'sparse level capacity overflow (active > cap): %s — raise '
            'MODEL.BACKBONE_3D.LEVEL_CAPACITIES or the voxel cap; silent '
            'truncation would drop a whole spatial region' % over)


def _pad_coords(coords, cap):
    out = np.zeros((cap, 3), np.int32)
    n = min(len(coords), cap)
    out[:n] = coords[:n]
    return out


def collate_rulebooks(samples, spec):
    """Stack per-sample tables with the batch axis LEADING (data-parallel
    shardable). Row indices stay sample-local with -1 == missing neighbor;
    the backbone adds the per-sample block offset on device.
    """
    caps = spec['caps']
    out = {}
    for lvl in spec['subm_levels']:
        out[f'subm_{lvl}'] = np.stack(
            [s[f'subm_{lvl}'] for s in samples]).astype(np.int32)  # (B, K, cap)
    for src, dst, k, s_, p in spec['downs']:
        out[f'down_{src}->{dst}'] = np.stack(
            [s[f'down_{src}->{dst}'] for s in samples]).astype(np.int32)
        out[f'down_inv_{src}->{dst}'] = np.stack(
            [s[f'down_inv_{src}->{dst}'] for s in samples]).astype(np.int32)
    for lvl in spec['levels']:
        out[f'coords_{lvl}'] = np.stack(
            [s[f'coords_{lvl}'] for s in samples])            # (B, cap, 3)
        out[f'valid_{lvl}'] = np.stack([
            np.arange(caps[lvl]) < s[f'nvalid_{lvl}'] for s in samples])
    return out


def sort_voxels_by_key(voxel_coords_zyx, shape_zyx):
    """Return the argsort that puts one sample's voxels in z-last key order."""
    d, h, w = shape_zyx
    keys = ((voxel_coords_zyx[:, 1].astype(np.int64) * w
             + voxel_coords_zyx[:, 2]) * d + voxel_coords_zyx[:, 0])
    return np.argsort(keys, kind='stable')


# Per-level overflow accounting. The reference's spconv has dynamic active
# counts; our fixed per-level capacities (spconv_backbone.level_capacities)
# silently truncate instead. These counters make truncation observable:
# samples_over[lvl] counts samples whose pre-truncation active count exceeded
# the level capacity, max_active[lvl] the largest count ever seen.
_OVERFLOW_STATS = {'samples': 0, 'samples_over': {}, 'max_active': {},
                   'dropped': {}}


def reset_overflow_stats():
    _OVERFLOW_STATS.update(samples=0, samples_over={}, max_active={},
                           dropped={})


def get_overflow_stats():
    """Snapshot of truncation counters since the last reset (plain dict)."""
    return {'samples': _OVERFLOW_STATS['samples'],
            'samples_over': dict(_OVERFLOW_STATS['samples_over']),
            'max_active': dict(_OVERFLOW_STATS['max_active']),
            'dropped': dict(_OVERFLOW_STATS['dropped'])}


def _record_overflow(sample_out, spec):
    _OVERFLOW_STATS['samples'] += 1
    for lvl in spec['levels']:
        tot = sample_out.get(f'ntotal_{lvl}')
        if tot is None:
            continue
        cap = spec['caps'][lvl]
        st = _OVERFLOW_STATS
        st['max_active'][lvl] = max(st['max_active'].get(lvl, 0), tot)
        if tot > cap:
            st['samples_over'][lvl] = st['samples_over'].get(lvl, 0) + 1
            st['dropped'][lvl] = st['dropped'].get(lvl, 0) + (tot - cap)


def prepare_batch_rulebooks(batch_np, backbone_name, grid_size,
                            caps_override=None, strict=True):
    """Sort a numpy batch's voxels into key order and attach collated
    rulebooks. Mutates and returns ``batch_np`` (numpy arrays, pre-device).

    batch_np needs: voxel_coords (B, cap, 3) zyx, voxel_valid (B, cap),
    voxels, voxel_num_points.
    """
    coords = batch_np['voxel_coords']
    valid = batch_np['voxel_valid']
    b, cap = coords.shape[:2]
    nx, ny, nz = grid_size
    shape1 = (nz + 1, ny, nx)
    spec = backbone_spec(backbone_name, grid_size, cap,
                         caps_override=caps_override, strict=strict)

    samples = []
    for i in range(b):
        n = int(valid[i].sum())
        order = sort_voxels_by_key(coords[i, :n], shape1)
        for key in ('voxels', 'voxel_coords', 'voxel_num_points'):
            arr = batch_np[key][i]
            arr[:n] = arr[:n][order]
        sample = build_sample_rulebooks(batch_np['voxel_coords'][i], n, spec)
        _record_overflow(sample, spec)
        samples.append(sample)
    rb = collate_rulebooks(samples, spec)
    batch_np['rulebooks'] = rb
    return batch_np
