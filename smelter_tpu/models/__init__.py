"""Model zoo: the five BASELINE.json eval configs, each as a hand-written
torch reference + fx export to the IR. Sizes are parameterizable so tests
can run scaled-down variants on CPU."""

from . import audio_kws, bert_encoder, convnext, esrgan, sd_unet, segnet, speech_encoder, mobilenet_v2, mobilenet_v3, resnet50, retina_fpn, text_lstm, unet, vit  # noqa: F401

ZOO = {
    "mobilenet_v2": mobilenet_v2.build,
    "resnet50": resnet50.build,
    "resnet101": lambda **kw: resnet50.build(layers=(3, 4, 23, 3), **kw),
    "resnet152": lambda **kw: resnet50.build(layers=(3, 8, 36, 3), **kw),
    "unet": unet.build,
    "segnet": segnet.build,
    "esrgan": esrgan.build,
    "vit_b16": vit.build,
    "vit_l16": lambda **kw: vit.build(dim=1024, depth=24, heads=16, **kw),
    "retina_fpn": retina_fpn.build,
    "mobilenet_v3": mobilenet_v3.build,
    "convnext": convnext.build,  # ConvNeXt-T shapes by default
    # bench.py passes image_size; audio models take fixed-length clips/frames
    "speech_encoder": lambda batch=1, image_size=224, **kw: speech_encoder.build(
        batch=batch, frames=1000, **kw),
    "audio_kws": lambda batch=1, image_size=224, **kw: audio_kws.build(
        batch=batch, samples=16000, **kw),
    # seq_len fixed at 128 (BERT-base-ish shape at dim 256); image_size unused
    "bert_encoder": lambda batch=8, image_size=224, **kw: bert_encoder.build_zoo(
        batch=batch, seq_len=128, **kw),
    # image_size is the PIXEL size; the latent UNet runs at /8 (SD-style).
    # Width scaled to an MXU-meaningful 128 (SD-1.5 uses 320); tests build
    # smaller explicit configs.
    "sd_unet": lambda batch=1, image_size=256, **kw: sd_unet.build(
        batch=batch, image_size=max(8, image_size // 8),
        **{"base": 128, "ctx_dim": 256, "ctx_len": 16, "heads": 8, **kw}),
}
