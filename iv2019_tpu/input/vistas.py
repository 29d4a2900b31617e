"""Mapillary Vistas per-pixel input pipeline.

The reference keeps a separate module (input_vistas.py) whose only
differences from Cityscapes are data-level: JPEG-encoded images, variable
image sizes (so resize must precede batching — our pipeline always resizes
per element), and memory-tuned max training resolutions
(input_vistas.py:7-10). The shared implementation in cityscapes.py handles
both via PIL format auto-detection; this module re-exports it under the
reference's per-dataset entry-point names.

Memory notes carried from the reference (4-GPU TF figures, for schedule
parity): max trainable dims 827x1139 (Nb=12, PSP), 918x1266 (Nb=8, PSP),
1240x1710 (Nb=4, cross-replica BN, bilinear only).
"""

from iv2019_tpu.input.cityscapes import (  # noqa: F401
    evaluate_input,
    synthetic_train_batches,
    train_input,
)

__all__ = ["train_input", "evaluate_input", "synthetic_train_batches"]
