"""End-to-end: full probe training on the synthetic dataset over the 8-device
mesh must beat chance, checkpoint, resume, and early-stop consistently."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

import ep_tpu.models.assembly as assembly
from ep_tpu.cli.linprobe import main
from ep_tpu.configs import TrainConfig
from ep_tpu.models.vit import ViTConfig

TINY = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=2,
                 num_heads=2, dtype=jnp.float32)


@pytest.fixture(autouse=True)
def tiny_backbone(monkeypatch):
    import ep_tpu.cli.linprobe as linprobe
    monkeypatch.setattr(assembly, "build_backbone_config", lambda cfg: TINY)
    # linprobe binds the symbol at import time — patch its local name too
    monkeypatch.setattr(linprobe, "build_backbone_config", lambda cfg: TINY)
    yield


def _cfg(tmp_path, **kw):
    base = dict(
        dataset_name="fake", nb_classes=4, image_size=16, batch_size=32,
        model="vit_tiny_patch16", cls_features="gap", epochs=3,
        warmup_epochs=1, blr=4.0, output_dir=str(tmp_path), num_workers=2,
        amp="float32", seed=0,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_lp_learns_fake_dataset(tmp_path):
    """The synthetic dataset is linearly separable from pooled features, so
    even a random frozen backbone + LP head should beat chance quickly."""
    res = main(_cfg(tmp_path, cls_features="gap", epochs=5))
    assert res["max_accuracy"] > 40.0  # chance = 25%

    log = (tmp_path / "training_log.txt").read_text()
    assert "Epoch, Train Loss, Train Acc1, Val Loss, Val Acc1, Val Acc5" in log
    assert "Max Accuracy:" in log
    assert (tmp_path / "checkpoint-.msgpack").exists()


def test_ep_head_trains(tmp_path):
    res = main(_cfg(tmp_path, cls_features="ep", ep_queries=4, d_out=1,
                    pallas_pool=False, epochs=4))
    assert res["max_accuracy"] > 40.0


def test_ep_all_head_trains(tmp_path):
    """The _all variant pools over [CLS]+patches (models_vit.py:414-417)
    through the whole driver: remap, head graft, train, eval, checkpoint."""
    res = main(_cfg(tmp_path, cls_features="ep_all", ep_queries=4, d_out=1,
                    pallas_pool=False, epochs=4))
    assert res["max_accuracy"] > 40.0


def test_resume_continues(tmp_path):
    main(_cfg(tmp_path, epochs=2))
    # auto-resume picks up the checkpoint and trains epochs 2..3
    res = main(_cfg(tmp_path, epochs=4, auto_resume=True))
    assert "max_accuracy" in res
    log = (tmp_path / "training_log.txt").read_text()
    # rewritten header + resumed epochs only
    lines = [l for l in log.splitlines() if l[:1].isdigit()]
    assert lines[0].startswith("2,")


def test_eval_mode(tmp_path):
    main(_cfg(tmp_path, epochs=1))
    res = main(_cfg(tmp_path, eval=True,
                    resume=str(tmp_path / "checkpoint-.msgpack")))
    assert "acc1" in res


def test_knn_eval(tmp_path):
    res = main(_cfg(tmp_path, knn_eval=True, cls_features="gap"))
    assert 5 in res["knn"]
    top1, top5 = res["knn"][5]
    assert 0.0 <= top1 <= 100.0 and top1 <= top5 + 1e-6


def test_early_stop_triggers(tmp_path):
    res = main(_cfg(
        tmp_path, epochs=30, blr=0.0, early_stop=True,
        early_stop_patience=2, early_stop_min_epochs=3, warmup_epochs=0))
    log = (tmp_path / "training_log.txt").read_text()
    assert "[early-stop]" in log


def test_grain_pipeline(tmp_path):
    """--use_grain swaps in the grain-backed input pipeline."""
    res = main(_cfg(tmp_path, use_grain=True, num_workers=0, epochs=6))
    assert res["max_accuracy"] > 40.0


def test_feature_cache_mode(tmp_path):
    """--cache_features: one backbone pass, then head-only training; must
    reach comparable accuracy to the no-cache run."""
    res = main(_cfg(tmp_path, cache_features=True, epochs=5))
    assert res["max_accuracy"] > 40.0


def test_feature_cache_multi_aug(tmp_path):
    """--cache_augs K: K epoch-seeded augmentation draws per image; epochs
    cycle variants, and training still learns."""
    res = main(_cfg(tmp_path, cache_features=True, cache_augs=2, epochs=4))
    assert res["max_accuracy"] > 40.0


def test_cached_loader_cycles_aug_variants():
    from ep_tpu.train.feature_cache import CachedFeatureLoader

    n, T, D = 8, 3, 4
    labels = np.arange(n, dtype=np.int32)
    v0 = np.zeros((n, T, D), np.float32)
    v1 = np.ones((n, T, D), np.float32)
    ld = CachedFeatureLoader([v0, v1], labels, batch_size=4, shuffle=False,
                             drop_last=True)
    for epoch, want in [(0, 0.0), (1, 1.0), (2, 0.0), (5, 1.0)]:
        ld.set_epoch(epoch)
        f, l, valid = next(iter(ld))
        assert float(f.mean()) == want, (epoch, float(f.mean()))
        np.testing.assert_array_equal(l, labels[:4])  # labels align
    # single-array input keeps the old behavior
    ld1 = CachedFeatureLoader(v1, labels, batch_size=4, shuffle=True,
                              drop_last=True)
    ld1.set_epoch(3)
    f, _, _ = next(iter(ld1))
    assert float(f.mean()) == 1.0


def test_finetuning_mode(tmp_path):
    res = main(_cfg(tmp_path, finetuning=True, optimizer="sgd", blr=0.02,
                    epochs=2))
    assert "max_accuracy" in res


def test_checkpoint_is_head_only_in_probing(tmp_path):
    """Probing checkpoints hold head params only (main_linprobe.py:706-713);
    the backbone must not be serialized."""
    import flax.serialization as fser
    main(_cfg(tmp_path, epochs=1))
    payload = fser.msgpack_restore(
        (tmp_path / "checkpoint-.msgpack").read_bytes())
    assert set(payload["model"].keys()) == {"head"}
    # a full-model (finetuning) checkpoint carries the backbone too
    main(_cfg(tmp_path, epochs=1, finetuning=True, optimizer="sgd",
              blr=0.01, output_dir=str(tmp_path / "ft")))
    payload = fser.msgpack_restore(
        (tmp_path / "ft" / "checkpoint-.msgpack").read_bytes())
    assert "backbone" in payload["model"] and "head" in payload["model"]


def test_accum_iter(tmp_path):
    res = main(_cfg(tmp_path, accum_iter=2, batch_size=16, epochs=3))
    assert "max_accuracy" in res


def test_dino_oracle_mode(tmp_path):
    res = main(_cfg(tmp_path, cls_features="dino", epochs=2))
    assert "max_accuracy" in res


@pytest.mark.parametrize("head", ["cp2", "attn-mn", "cls"])
def test_diagnostic_feature_modes_e2e(tmp_path, head):
    res = main(_cfg(tmp_path, cls_features=head, epochs=2))
    assert "max_accuracy" in res


def test_ep_d_out(tmp_path):
    """--d_out shrinks the classifier input to D/d_out (poolings/ep.py:25,45
    + main_linprobe.py:487-493)."""
    import flax.serialization as fser
    res = main(_cfg(tmp_path, cls_features="ep", ep_queries=4, d_out=2,
                    pallas_pool=False, epochs=2))
    assert "max_accuracy" in res
    payload = fser.msgpack_restore(
        (tmp_path / "checkpoint-.msgpack").read_bytes())
    fc_kernel = payload["model"]["head"]["fc"]["kernel"]
    assert fc_kernel.shape[0] == 32 // 2  # TINY embed_dim // d_out


@pytest.mark.parametrize("head", ["gap", "ep"])
def test_mae_latent_probing(tmp_path, monkeypatch, head):
    """--model mae_vit_*: probing consumes the MAE encoder latent (working
    equivalent of the reference's vestigial MaskedAutoencoderViT branches,
    engine_finetune.py:133-135,193-196)."""
    import ep_tpu.cli.linprobe as linprobe
    from ep_tpu.models.mae import MAEConfig

    tiny_mae = MAEConfig(img_size=16, patch_size=4, embed_dim=32, depth=2,
                         num_heads=2, decoder_embed_dim=16, decoder_depth=1,
                         decoder_num_heads=2, dtype=jnp.float32)
    monkeypatch.setattr(assembly, "build_backbone_config",
                        lambda cfg: tiny_mae)
    monkeypatch.setattr(linprobe, "build_backbone_config",
                        lambda cfg: tiny_mae)
    res = main(_cfg(tmp_path, model="mae_vit_base_patch16", cls_features=head,
                    ep_queries=4, d_out=1, pallas_pool=False, epochs=4))
    assert res["max_accuracy"] > 40.0  # chance = 25%


def test_openclip_style_backbone_e2e(tmp_path, monkeypatch):
    """--openclip tower shape: pre_norm + final LN + cls-only projection
    runs the full driver (cls -> LP on the projected dim, ep -> pooling on
    the un-projected patch tokens)."""
    import ep_tpu.cli.linprobe as linprobe

    clip_tiny = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=2,
                          num_heads=2, final_norm="ln", pre_norm=True,
                          proj_dim=24, mlp_type="quick_gelu",
                          dtype=jnp.float32)
    monkeypatch.setattr(assembly, "build_backbone_config",
                        lambda cfg: clip_tiny)
    monkeypatch.setattr(linprobe, "build_backbone_config",
                        lambda cfg: clip_tiny)
    # cls goes through the 24-dim random projection, which squeezes the
    # linearly-separable signal — beat chance (25%), not the usual 40% bar
    res = main(_cfg(tmp_path, model="ViT-B-16", openclip=True,
                    cls_features="cls", epochs=6))
    assert res["max_accuracy"] > 32.0
    res = main(_cfg(tmp_path / "ep", model="ViT-B-16", openclip=True,
                    cls_features="ep", ep_queries=4, d_out=1,
                    pallas_pool=False, epochs=3,
                    output_dir=str(tmp_path / "ep")))
    assert res["max_accuracy"] > 40.0
