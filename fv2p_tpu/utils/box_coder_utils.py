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
        cgs = [box_encodings[..., i] + anchors[..., i]
               for i in range(7 + int(self.encode_angle_by_sincos),
                              anchors.shape[-1])]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], axis=-1)
