"""Data layer: Omni3D loader, filters, 3D-aware mapper, samplers, batching.

Public surface mirrors the reference `cubercnn.data` package
(cubercnn/data/__init__.py re-exports datasets/dataset_mapper/build/builtin).
"""
from .builtin import get_omni3d_categories  # noqa: F401
from .datasets import (Omni3D, get_dataset, get_filter_settings_from_cfg,  # noqa: F401
                       is_ignore, load_omni3d_json, metadata,
                       register_and_store_model_metadata, register_dataset,
                       simple_register)
from .mapper import (DatasetMapper3D, collate_batch, pad_to_bucket,  # noqa: F401
                     read_image_bgr, resize_image_bilinear,
                     resize_shortest_edge)
from .build import (build_detection_test_loader,  # noqa: F401
                    build_detection_train_loader,
                    get_detection_dataset_dicts)
