"""Model zoo: the five BASELINE.json eval configs, each as a hand-written
torch reference + fx export to the IR. Sizes are parameterizable so tests
can run scaled-down variants on CPU."""

from . import esrgan, mobilenet_v2, resnet50, unet, vit  # noqa: F401

ZOO = {
    "mobilenet_v2": mobilenet_v2.build,
    "resnet50": resnet50.build,
    "unet": unet.build,
    "esrgan": esrgan.build,
    "vit_b16": vit.build,
}
