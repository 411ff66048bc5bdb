"""EP's core claim, demo scale: when the class evidence lives in one patch,
attentive pooling (EP) beats global average pooling — the phenomenon the
reference paper quantifies on IN-1K (BASELINE.md LP vs EP columns),
reproduced here on the synthetic needle dataset with a frozen random
backbone. Deterministic: fixed seeds, CPU."""
import jax.numpy as jnp
import pytest

import ep_tpu.cli.linprobe as linprobe
from ep_tpu.configs import TrainConfig
from ep_tpu.models.vit import ViTConfig

TINY = ViTConfig(img_size=32, patch_size=8, embed_dim=48, depth=2,
                 num_heads=4, dtype=jnp.float32)


@pytest.mark.slow
def test_ep_beats_gap_on_needle(tmp_path, monkeypatch):
    monkeypatch.setattr(linprobe, "build_backbone_config", lambda cfg: TINY)

    def run(head):
        cfg = TrainConfig(
            dataset_name="fake_needle", nb_classes=8, image_size=32,
            batch_size=64, cls_features=head, epochs=8, warmup_epochs=1,
            blr=8.0, ep_queries=4, output_dir="", num_workers=2,
            amp="float32", seed=0, pallas_pool=False)
        return linprobe.main(cfg)["max_accuracy"]

    gap_acc = run("pos")  # GAP linear probe
    ep_acc = run("ep")
    assert ep_acc > gap_acc + 5.0, (gap_acc, ep_acc)
    assert ep_acc > 55.0  # chance is 12.5%


@pytest.mark.slow
def test_ep_advantage_survives_int8_backbone(tmp_path, monkeypatch):
    """The ~1.2% int8 feature error must not erase the EP-beats-GAP
    phenomenon: same needle protocol with the int8 MLP kernel engaged
    (interpret mode) in the frozen backbone."""
    monkeypatch.setenv("EP_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(
        linprobe, "build_backbone_config",
        lambda cfg: TINY.replace(attn_impl="pallas", int8_mlp=True))

    def run(head):
        cfg = TrainConfig(
            dataset_name="fake_needle", nb_classes=8, image_size=32,
            batch_size=64, cls_features=head, epochs=8, warmup_epochs=1,
            blr=8.0, ep_queries=4, output_dir="", num_workers=2,
            amp="float32", seed=0, pallas_pool=False, attn_impl="pallas",
            int8_mlp=True)
        return linprobe.main(cfg)["max_accuracy"]

    gap_acc = run("pos")
    ep_acc = run("ep")
    assert ep_acc > gap_acc + 5.0, (gap_acc, ep_acc)
    assert ep_acc > 55.0
