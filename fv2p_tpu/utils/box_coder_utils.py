"""Box coders (reference ``pcdet/utils/box_coder_utils.py``)."""
import jax.numpy as jnp
import numpy as np


class ResidualCoder:
    """SECOND-style 7-dim residual coder (reference box_coder_utils.py:5-78):
    (xt, yt) normalized by the anchor BEV diagonal, zt by dza, log-dims, raw
    angle difference; optional encode_angle_by_sincos adds 8th/9th dims."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False, **kwargs):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        if self.encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        """boxes, anchors: (N, 7 + C) -> (N, code_size)."""
        anchors = anchors.at[:, 3:6].set(jnp.clip(anchors[:, 3:6], min=1e-5)) \
            if hasattr(anchors, 'at') else anchors
        boxes = boxes.at[:, 3:6].set(jnp.clip(boxes[:, 3:6], min=1e-5)) \
            if hasattr(boxes, 'at') else boxes

        xa, ya, za, dxa, dya, dza = [anchors[:, i] for i in range(6)]
        ra = anchors[:, 6]
        xg, yg, zg, dxg, dyg, dzg = [boxes[:, i] for i in range(6)]
        rg = boxes[:, 6]

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        cts = [boxes[:, i] - anchors[:, i] for i in range(7, boxes.shape[-1])]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, *rts, *cts], axis=-1)

    def decode(self, box_encodings, anchors):
        """box_encodings (..., code_size), anchors (..., 7+C) -> (..., 7+C)."""
        xa, ya, za, dxa, dya, dza = [anchors[..., i] for i in range(6)]
        ra = anchors[..., 6]
        if not self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt = [box_encodings[..., i] for i in range(6)]
            rt = box_encodings[..., 6]
        else:
            xt, yt, zt, dxt, dyt, dzt = [box_encodings[..., i] for i in range(6)]
            cost, sint = box_encodings[..., 6], box_encodings[..., 7]

        diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        s = int(self.encode_angle_by_sincos)
        cgs = [box_encodings[..., i + s] + anchors[..., i]
               for i in range(7, anchors.shape[-1])]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)


class PointResidualCoder:
    """Point-based 8-dim coder with per-class mean sizes and sin/cos heading
    (reference box_coder_utils.py:144-226)."""

    def __init__(self, code_size=8, use_mean_size=True, **kwargs):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if self.use_mean_size:
            self.mean_size = np.array(kwargs['mean_size'], np.float32)
            assert self.mean_size.min() > 0

    def encode(self, gt_boxes, points, gt_classes=None):
        """gt_boxes (N, 7+C), points (N, 3), gt_classes (N,) in [1, C]."""
        gt_boxes = gt_boxes.at[:, 3:6].set(jnp.clip(gt_boxes[:, 3:6], min=1e-5))
        xg, yg, zg = gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2]
        dxg, dyg, dzg = gt_boxes[:, 3], gt_boxes[:, 4], gt_boxes[:, 5]
        rg = gt_boxes[:, 6]
        xa, ya, za = points[:, 0], points[:, 1], points[:, 2]
        if self.use_mean_size:
            ms = jnp.asarray(self.mean_size)
            sizes = ms[jnp.clip(gt_classes - 1, 0, ms.shape[0] - 1)]
            dxa, dya, dza = sizes[:, 0], sizes[:, 1], sizes[:, 2]
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xt = (xg - xa) / diagonal
            yt = (yg - ya) / diagonal
            zt = (zg - za) / dza
            dxt = jnp.log(dxg / dxa)
            dyt = jnp.log(dyg / dya)
            dzt = jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        extra = [gt_boxes[:, i] for i in range(7, gt_boxes.shape[-1])]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt,
                          jnp.cos(rg), jnp.sin(rg), *extra], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xt, yt, zt = (box_encodings[..., 0], box_encodings[..., 1],
                      box_encodings[..., 2])
        dxt, dyt, dzt = (box_encodings[..., 3], box_encodings[..., 4],
                         box_encodings[..., 5])
        cost, sint = box_encodings[..., 6], box_encodings[..., 7]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            ms = jnp.asarray(self.mean_size)
            sizes = ms[jnp.clip(pred_classes - 1, 0, ms.shape[0] - 1)]
            dxa, dya, dza = sizes[..., 0], sizes[..., 1], sizes[..., 2]
            diagonal = jnp.sqrt(dxa ** 2 + dya ** 2)
            xg = xt * diagonal + xa
            yg = yt * diagonal + ya
            zg = zt * dza + za
            dxg = jnp.exp(dxt) * dxa
            dyg = jnp.exp(dyt) * dya
            dzg = jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        extra = [box_encodings[..., i] for i in range(8, box_encodings.shape[-1])]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extra], axis=-1)
