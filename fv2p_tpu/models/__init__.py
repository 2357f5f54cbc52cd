"""Model building (reference ``pcdet/models/__init__.py``)."""
from .detectors.detector3d_template import build_detector


def build_network(model_cfg, num_class, class_names, dataset_meta,
                  compute_dtype=None):
    return build_detector(model_cfg, num_class=num_class,
                          class_names=class_names, dataset_meta=dataset_meta,
                          compute_dtype=compute_dtype)
