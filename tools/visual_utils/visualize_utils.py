"""Headless scene visualization (reference ``tools/visual_utils/
visualize_utils.py``, mayavi-based). Re-designed for headless TPU pods:
matplotlib Agg BEV renderings saved to PNG instead of an interactive
mayavi window — the drawing semantics (points colored by height, gt boxes
green, predictions colored by score, heading tick) are preserved."""
import numpy as np


def _box_bev_corners(boxes):
    """(N, 7) -> (N, 4, 2) BEV corners."""
    dx, dy = boxes[:, 3] / 2, boxes[:, 4] / 2
    corners = np.stack([
        np.stack([dx, dy], 1), np.stack([dx, -dy], 1),
        np.stack([-dx, -dy], 1), np.stack([-dx, dy], 1)], axis=1)
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    rot = np.stack([np.stack([c, -s], 1), np.stack([s, c], 1)], axis=1)
    return np.einsum('nij,nkj->nki', rot, corners) + boxes[:, None, 0:2]


def draw_scenes_bev(points, gt_boxes=None, ref_boxes=None, ref_scores=None,
                    ref_labels=None, point_cloud_range=None,
                    output_path='scene_bev.png'):
    """Save a BEV rendering of one scan.

    Args:
        points: (N, 3+) xyz[...]; gt_boxes: (M, 7); ref_boxes: (K, 7)
        predictions with optional scores/labels.
    """
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 12))
    ax.set_facecolor('black')
    fig.patch.set_facecolor('black')
    pts = np.asarray(points)
    ax.scatter(pts[:, 0], pts[:, 1], s=0.2, c=pts[:, 2], cmap='viridis',
               vmin=-2.5, vmax=1.5)

    def draw_boxes(boxes, color, scores=None, labels=None):
        boxes = np.asarray(boxes)
        if boxes.size == 0:
            return
        corners = _box_bev_corners(boxes)
        for i, cs in enumerate(corners):
            poly = np.concatenate([cs, cs[:1]], axis=0)
            ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=1.0)
            # heading tick from center to front-face midpoint
            front = (cs[0] + cs[1]) / 2
            ax.plot([boxes[i, 0], front[0]], [boxes[i, 1], front[1]],
                    color=color, linewidth=1.0)
            if scores is not None:
                txt = '%.2f' % float(scores[i])
                if labels is not None:
                    txt = '%d:%s' % (int(labels[i]), txt)
                ax.text(cs[0, 0], cs[0, 1], txt, color=color, fontsize=6)

    if gt_boxes is not None:
        draw_boxes(gt_boxes, 'lime')
    if ref_boxes is not None:
        draw_boxes(ref_boxes, 'red', ref_scores, ref_labels)

    if point_cloud_range is not None:
        pr = point_cloud_range
        ax.set_xlim(pr[0], pr[3])
        ax.set_ylim(pr[1], pr[4])
    ax.set_aspect('equal')
    ax.axis('off')
    fig.savefig(output_path, dpi=150, bbox_inches='tight',
                facecolor='black')
    plt.close(fig)
    return output_path


def save_bev_heatmap(heatmap, output_path='heatmap.png'):
    """Dump a (H, W) or (H, W, C) BEV heatmap (reference
    ``tools/eval_utils/mapvisulize_utils.py``: per-channel max)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    hm = np.asarray(heatmap)
    if hm.ndim == 3:
        hm = hm.max(axis=-1)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(hm, cmap='hot', origin='lower')
    ax.axis('off')
    fig.savefig(output_path, dpi=150, bbox_inches='tight')
    plt.close(fig)
    return output_path


def draw_scenes(points, gt_boxes=None, ref_boxes=None, ref_scores=None,
                ref_labels=None, output_path='scene.png'):
    """Reference-API alias (``visualize_utils.draw_scenes`` drew a mayavi 3D
    scene; headless TPU hosts render the BEV projection instead)."""
    return draw_scenes_bev(points, gt_boxes=gt_boxes, ref_boxes=ref_boxes,
                           ref_scores=ref_scores, ref_labels=ref_labels,
                           output_path=output_path)
