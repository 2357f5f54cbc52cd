"""BEV feature-map visualization helpers (reference
``tools/eval_utils/mapvisulize_utils.py``), numpy/matplotlib-native (the
reference uses torch + cv2's JET colormap; neither is needed here)."""
import numpy as np


def featuremap_to_greymap(feature_map):
    """(C, H, W) or (B, C, H, W) feature map -> (H, W) grey map in [0, 1]:
    global-average-pooled channel weights, reweighted channel sum, relu,
    min-max normalization (reference :6-36)."""
    feature_map = np.asarray(feature_map, dtype=np.float32)
    if feature_map.ndim == 3:
        feature_map = feature_map[None]
    elif feature_map.ndim != 4:
        raise NotImplementedError(feature_map.shape)

    channel_weights = feature_map.mean(axis=(2, 3), keepdims=True)
    reduced = (channel_weights * feature_map).sum(axis=1)[0]
    reduced = np.maximum(reduced, 0.0)
    a_min, a_max = reduced.min(), reduced.max()
    return (reduced - a_min) / max(a_max - a_min, 1e-12)


def greymap_to_rgbimg(map_grey, background=None, background_ratio=0.2,
                      CHW_format=False):
    """(H, W) grey map in [0, 1] -> (H, W, 3) uint8 jet-colormapped image,
    optionally alpha-blended over a background (reference :38-55)."""
    map_grey = np.asarray(map_grey, dtype=np.float32)
    if background is None:
        background = np.zeros((map_grey.shape[0], map_grey.shape[1], 3))

    try:
        from matplotlib import cm
        map_rgb = (cm.jet(map_grey)[..., :3] * 255)
    except ImportError:
        # jet approximation without matplotlib: linear RGB ramps
        g = map_grey
        r = np.clip(1.5 - np.abs(4 * g - 3), 0, 1)
        gn = np.clip(1.5 - np.abs(4 * g - 2), 0, 1)
        b = np.clip(1.5 - np.abs(4 * g - 1), 0, 1)
        map_rgb = np.stack([r, gn, b], axis=-1) * 255

    img = np.clip(map_rgb + background_ratio * background, 0, 255).astype(np.uint8)
    if CHW_format:
        img = np.transpose(img, (2, 0, 1))
    return img
