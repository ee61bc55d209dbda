"""RetinaFace model configurations.

Values match the reference configs (detect_face/utils/config.py:1-29) so that
converted checkpoints decode identically; keys are the same for API parity.
"""

cfg_mnet = {
    "name": "mobilenet0.25",
    "min_sizes": [[16, 32], [64, 128], [256, 512]],
    "steps": [8, 16, 32],
    "variance": [0.1, 0.2],
    "clip": False,
    "loc_weight": 2.0,
    "train_image_size": 840,
    "return_layers": {"stage1": 1, "stage2": 2, "stage3": 3},
    "in_channel": 32,
    "out_channel": 64,
}

cfg_re50 = {
    "name": "Resnet50",
    "min_sizes": [[16, 32], [64, 128], [256, 512]],
    "steps": [8, 16, 32],
    "variance": [0.1, 0.2],
    "clip": False,
    "loc_weight": 2.0,
    "train_image_size": 840,
    "return_layers": {"layer2": 1, "layer3": 2, "layer4": 3},
    "in_channel": 256,
    "out_channel": 256,
}


def get_config(backbone: str) -> dict:
    """Select config by backbone name (reference face.py:35 semantics)."""
    return cfg_mnet if backbone == "mobilenet" else cfg_re50
