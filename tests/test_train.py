"""Training-stack tests: loss parity vs the reference criterion, gate
targets, optimizer schedule, jitted train step behavior, checkpoints.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.config import (Config, GuidedAttentionConfig, ModelConfig,
                                  TrainConfig)
from tacotron2_tpu.train import (build_gate_target, cast_params_for_compute,
                                 compute_dtype_of,
                                 create_train_state, eval_step,
                                 make_optimizer, milestone_schedule,
                                 restore_checkpoint, save_checkpoint,
                                 tacotron2_loss, train_step,
                                 train_step_accum)

SMALL_MODEL = ModelConfig(
    symbols_embedding_dim=32, encoder_embedding_dim=32, decoder_rnn_dim=48,
    prenet_dim=16, attention_rnn_dim=48, attention_dim=24,
    location_n_filters=8, location_kernel_size=15,
    postnet_embedding_dim=24, max_decoder_steps=50)
SMALL = Config(model=SMALL_MODEL)
G = GuidedAttentionConfig()


def _fake_outputs(b=2, t_dec=12, t_enc=7, n_mels=80, seed=0):
    rng = np.random.default_rng(seed)
    mel_coarse = rng.standard_normal((b, t_dec, n_mels)).astype(np.float32)
    mel_post = mel_coarse + 0.1 * rng.standard_normal(
        (b, t_dec, n_mels)).astype(np.float32)
    gate = rng.standard_normal((b, t_dec)).astype(np.float32)
    logits = rng.standard_normal((b, t_dec, t_enc)).astype(np.float32)
    align = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    mel_target = rng.standard_normal((b, n_mels, t_dec)).astype(np.float32)
    mel_lengths = np.array([t_dec, t_dec - 3], dtype=np.int32)
    text_lengths = np.array([t_enc, t_enc - 2], dtype=np.int32)
    return (mel_post, mel_coarse, gate, align, mel_target, mel_lengths,
            text_lengths)


class TestGateTarget:
    def test_matches_reference_semantics(self):
        # reference: gate_target[j, l-1:] = 1 (train.py:506-508)
        gt = np.asarray(build_gate_target(jnp.asarray([4, 2]), 6))
        np.testing.assert_array_equal(
            gt, [[0, 0, 0, 1, 1, 1], [0, 1, 1, 1, 1, 1]])


@pytest.fixture(scope="module")
def ref_criterion():
    torch = pytest.importorskip("torch")
    for name in ("librosa", "librosa.feature", "librosa.feature.inverse",
                 "soundfile", "pandas"):
        sys.modules.setdefault(name, types.ModuleType(name))
    # matplotlib is installed; pandas stub is enough for src.data_utils
    spec = importlib.util.spec_from_file_location(
        "ref_train_module", "/root/reference/train.py")
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, "/root/reference")
    try:
        spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"reference train module unavailable: {e}")
    finally:
        sys.path.pop(0)
    return torch, mod.Tacotron2Loss


class TestLossParityVsReference:
    @pytest.mark.parametrize("loss_step", [0, 1500, 10000])
    def test_parity(self, ref_criterion, loss_step):
        torch, RefLoss = ref_criterion
        (mel_post, mel_coarse, gate, align, mel_target, mel_lengths,
         text_lengths) = _fake_outputs()

        crit = RefLoss()
        crit.global_step = loss_step
        gate_target_t = torch.zeros(2, mel_target.shape[2])
        for j, l in enumerate(mel_lengths):
            gate_target_t[j, int(l) - 1:] = 1
        align_list = [torch.from_numpy(align[:, t]).float()
                      for t in range(align.shape[1])]
        t_total, t_mel, t_gate, t_kl = crit(
            (torch.from_numpy(mel_post), torch.from_numpy(mel_coarse),
             torch.from_numpy(gate), align_list),
            (torch.from_numpy(mel_target), gate_target_t,
             torch.from_numpy(mel_lengths).long()),
            text_lengths=torch.from_numpy(text_lengths).long())

        ours = tacotron2_loss(
            jnp.asarray(mel_post), jnp.asarray(mel_coarse),
            jnp.asarray(gate), jnp.asarray(align), jnp.asarray(mel_target),
            jnp.asarray(mel_lengths), jnp.asarray(text_lengths),
            jnp.int32(loss_step), G)

        np.testing.assert_allclose(float(ours.mel), t_mel.item(), rtol=2e-5)
        np.testing.assert_allclose(float(ours.gate), t_gate.item(), rtol=2e-5)
        np.testing.assert_allclose(float(ours.attention_kl), t_kl.item(),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(float(ours.total), t_total.item(),
                                   rtol=1e-3)
        np.testing.assert_allclose(float(ours.attention_weight),
                                   crit.current_attention_weight, rtol=1e-3)

    def test_padding_invariance(self):
        """Extra quantized padding must not change the loss values."""
        (mel_post, mel_coarse, gate, align, mel_target, mel_lengths,
         text_lengths) = _fake_outputs()
        base = tacotron2_loss(
            jnp.asarray(mel_post), jnp.asarray(mel_coarse),
            jnp.asarray(gate), jnp.asarray(align), jnp.asarray(mel_target),
            jnp.asarray(mel_lengths), jnp.asarray(text_lengths),
            jnp.int32(100), G)

        def pad_t(x, n):  # pad decoder-time axis 1
            return np.pad(x, [(0, 0), (0, n)] + [(0, 0)] * (x.ndim - 2))

        padded = tacotron2_loss(
            jnp.asarray(pad_t(mel_post, 8)), jnp.asarray(pad_t(mel_coarse, 8)),
            jnp.asarray(np.pad(gate, [(0, 0), (0, 8)])),
            jnp.asarray(pad_t(align, 8)),
            jnp.asarray(np.pad(mel_target, [(0, 0), (0, 0), (0, 8)])),
            jnp.asarray(mel_lengths), jnp.asarray(text_lengths),
            jnp.int32(100), G)
        np.testing.assert_allclose(float(padded.mel), float(base.mel),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(padded.gate), float(base.gate),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(padded.attention_kl),
                                   float(base.attention_kl), rtol=1e-5)


class TestOptimizer:
    def test_milestone_schedule(self):
        sched = milestone_schedule(1e-3, (100, 200), 0.8)
        assert np.isclose(float(sched(0)), 1e-3)
        assert np.isclose(float(sched(100)), 1e-3)      # old LR at milestone
        assert np.isclose(float(sched(101)), 8e-4)
        assert np.isclose(float(sched(201)), 6.4e-4)


def _train_batch(cfg, b=2, t_enc=8, t_dec=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "text": jnp.asarray(rng.integers(1, 72, (b, t_enc)), jnp.int32),
        "text_lengths": jnp.asarray([t_enc, t_enc - 2], jnp.int32),
        "mel": jnp.asarray(
            rng.standard_normal((b, cfg.model.n_mels, t_dec)) - 5.0,
            jnp.float32),
        "mel_lengths": jnp.asarray([t_dec, t_dec - 4], jnp.int32),
        "speaker_ids": jnp.zeros((b,), jnp.int32),
    }


class TestTrainStep:
    def test_loss_decreases_on_fixed_batch(self):
        state = create_train_state(SMALL, seed=0)
        tx = make_optimizer(SMALL.train)
        batch = _train_batch(SMALL)
        first = last = None
        for _ in range(12):
            state, losses, _ = train_step(state, batch, cfg=SMALL, tx=tx,
                                          use_postnet=True,
                                          sigma_warmup_steps=800)
            if first is None:
                first = float(losses.total)
            last = float(losses.total)
        assert int(state.step) == 12
        assert int(state.loss_step) == 12
        assert last < first

    def test_accum_matches_counterpart_counters(self):
        state = create_train_state(SMALL, seed=0)
        tx = make_optimizer(SMALL.train)
        b = _train_batch(SMALL)
        micro = {k: jnp.stack([v, v]) for k, v in b.items()}
        state2, losses, aligns = train_step_accum(
            state, micro, cfg=SMALL, tx=tx, use_postnet=True,
            sigma_warmup_steps=800, accum_steps=2)
        assert int(state2.step) == 1
        assert int(state2.loss_step) == 2  # per-microbatch, like reference
        assert aligns.ndim == 3

    def test_eval_step_deterministic(self):
        state = create_train_state(SMALL, seed=0)
        batch = _train_batch(SMALL)
        l1, _, e1 = eval_step(state, batch, cfg=SMALL, sigma_warmup_steps=800)
        l2, _, e2 = eval_step(state, batch, cfg=SMALL, sigma_warmup_steps=800)
        assert float(l1.total) == float(l2.total)
        assert float(e1) == float(e2) and float(e1) > 0.0


class TestPrecisionPolicy:
    """bf16 mixed-precision training (TrainConfig.precision; the TPU
    counterpart of the reference's AMP, train.py:389-392,518-523)."""

    FP32 = dataclasses_replace = None

    def _cfg(self, precision):
        import dataclasses
        return Config(model=SMALL_MODEL,
                      train=dataclasses.replace(TrainConfig(),
                                                precision=precision))

    def test_compute_dtype_mapping(self):
        assert compute_dtype_of("bfloat16") == jnp.bfloat16
        assert compute_dtype_of("bf16") == jnp.bfloat16
        assert compute_dtype_of("float32") is None
        with pytest.raises(ValueError):
            compute_dtype_of("fp16")

    def test_cast_preserves_non_fp32_leaves(self):
        tree = {"w": jnp.ones((2, 2), jnp.float32),
                "n": jnp.int32(3), "f": jnp.ones((2,), jnp.bfloat16)}
        out = cast_params_for_compute(tree, jnp.bfloat16)
        assert out["w"].dtype == jnp.bfloat16
        assert out["n"].dtype == jnp.int32
        assert cast_params_for_compute(tree, None) is tree

    def test_bf16_matches_fp32_loss_at_init(self):
        batch = _train_batch(self._cfg("float32"))
        l_fp, l_bf = {}, {}
        for name, cfg in (("fp", self._cfg("float32")),
                          ("bf", self._cfg("bfloat16"))):
            state = create_train_state(cfg, seed=0)
            tx = make_optimizer(cfg.train)
            _, losses, _ = train_step(state, batch, cfg=cfg, tx=tx,
                                      use_postnet=True,
                                      sigma_warmup_steps=800)
            (l_fp if name == "fp" else l_bf)["total"] = float(losses.total)
            (l_fp if name == "fp" else l_bf)["mel"] = float(losses.mel)
        np.testing.assert_allclose(l_bf["mel"], l_fp["mel"], rtol=2e-2)
        np.testing.assert_allclose(l_bf["total"], l_fp["total"], rtol=2e-2)

    def test_bf16_master_weights_and_moments_stay_fp32(self):
        cfg = self._cfg("bfloat16")
        state = create_train_state(cfg, seed=0)
        tx = make_optimizer(cfg.train)
        batch = _train_batch(cfg)
        before = jax.tree_util.tree_map(np.asarray, state.params)
        state, _, _ = train_step(state, batch, cfg=cfg, tx=tx,
                                 use_postnet=True, sigma_warmup_steps=800)
        moved = False
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(state.params)):
            assert b.dtype == a.dtype     # fp32 master weights preserved
            moved = moved or not np.array_equal(np.asarray(a), np.asarray(b))
        assert moved                      # the bf16 grads actually applied
        for leaf in jax.tree_util.tree_leaves(state.opt_state):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                assert leaf.dtype == jnp.float32

    def test_bf16_loss_decreases(self):
        cfg = self._cfg("bfloat16")
        state = create_train_state(cfg, seed=0)
        tx = make_optimizer(cfg.train)
        batch = _train_batch(cfg)
        first = last = None
        for _ in range(12):
            state, losses, _ = train_step(state, batch, cfg=cfg, tx=tx,
                                          use_postnet=True,
                                          sigma_warmup_steps=800)
            if first is None:
                first = float(losses.total)
            last = float(losses.total)
        assert np.isfinite(last) and last < first


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        state = create_train_state(SMALL, seed=0)
        tx = make_optimizer(SMALL.train)
        batch = _train_batch(SMALL)
        state, _, _ = train_step(state, batch, cfg=SMALL, tx=tx,
                                 use_postnet=True, sigma_warmup_steps=800)
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state, epoch=3, best_val_mel=1.25)

        template = create_train_state(SMALL, seed=1)
        restored, epoch, best = restore_checkpoint(path, template)
        assert epoch == 3
        assert np.isclose(best, 1.25)
        assert int(restored.step) == 1
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_checkpoint_kind_detection(self, tmp_path):
        from tacotron2_tpu.train.checkpoint import (checkpoint_kind,
                                                    load_any_checkpoint,
                                                    save_params_only)
        state = create_train_state(SMALL, seed=0)
        full = str(tmp_path / "full")
        save_checkpoint(full, state, epoch=1, best_val_mel=2.0)
        ponly = str(tmp_path / "ponly")
        save_params_only(ponly, state.params, state.model_state)

        assert checkpoint_kind(full) == "full"
        assert checkpoint_kind(ponly) == "params_only"
        assert checkpoint_kind(str(tmp_path / "nope")) == "unknown"

        # params-only loads signal "no training state" via full=None
        template = create_train_state(SMALL, seed=1)
        _, _, fullstate, epoch, best = load_any_checkpoint(ponly, template)
        assert fullstate is None and epoch == 0 and best == float("inf")
        _, _, fullstate, epoch, best = load_any_checkpoint(full, template)
        assert fullstate is not None and epoch == 1

    def test_params_only_restore_is_backend_independent(self, tmp_path):
        """restore_params_only must NOT replay the sharding metadata
        recorded at save time — a checkpoint written on one backend (CPU
        debug train) must load on another (TPU inference).  The property
        that guarantees this: restore targets come from the checkpoint's
        own shape/dtype metadata and land as HOST numpy arrays, never as
        device arrays placed by saved device names."""
        from tacotron2_tpu.train.checkpoint import (restore_params_only,
                                                    save_params_only)
        state = create_train_state(SMALL, seed=0)
        ponly = str(tmp_path / "ponly")
        save_params_only(ponly, state.params, state.model_state)

        params, model_state = restore_params_only(
            ponly, state.params, state.model_state)
        for leaf in (jax.tree_util.tree_leaves(params)
                     + jax.tree_util.tree_leaves(model_state)):
            assert isinstance(leaf, np.ndarray), type(leaf)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), b)

    def test_unloadable_checkpoint_raises_descriptive_error(self, tmp_path):
        from tacotron2_tpu.train.checkpoint import load_any_checkpoint
        bad = tmp_path / "bad"
        bad.mkdir()
        (bad / "junk.txt").write_text("not a checkpoint")
        template = create_train_state(SMALL, seed=0)
        with pytest.raises(RuntimeError) as exc_info:
            load_any_checkpoint(str(bad), template)
        # The chained error must name the path AND surface both failure
        # modes (full-state and params-only restore).
        msg = str(exc_info.value)
        assert "bad" in msg
        assert "full training state" in msg and "params-only" in msg


class TestCheckpointRetention:
    def test_prune_scopes_to_this_runs_checkpoints(self, tmp_path):
        """Resume into a directory full of pre-existing epoch checkpoints:
        the retention policy must only prune checkpoints THIS run wrote,
        never retroactively delete earlier runs' artifacts."""
        from tacotron2_tpu.train.loop import _prune_epoch_ckpts

        class Log:
            lines: list = []
            def log(self, msg):
                self.lines.append(msg)

        # pre-existing checkpoints from an earlier run
        for n in (1, 2, 3):
            (tmp_path / f"tacotron2_epoch_{n}").mkdir()
        # this run wrote epochs 10..15
        run_saved = []
        for n in range(10, 16):
            (tmp_path / f"tacotron2_epoch_{n}").mkdir()
            run_saved.append(n)
        logger = Log()
        _prune_epoch_ckpts(str(tmp_path), 2, logger, run_saved)

        surviving = sorted(p.name for p in tmp_path.iterdir())
        # earlier-run artifacts untouched; this run keeps only newest 2
        assert "tacotron2_epoch_1" in surviving
        assert "tacotron2_epoch_2" in surviving
        assert "tacotron2_epoch_3" in surviving
        assert "tacotron2_epoch_14" in surviving
        assert "tacotron2_epoch_15" in surviving
        assert "tacotron2_epoch_10" not in surviving
        assert "tacotron2_epoch_13" not in surviving
        # deletions are logged, and the tracking list is trimmed so the
        # next call doesn't re-walk pruned epochs
        assert any("Pruned epoch checkpoint" in l for l in logger.lines)
        assert run_saved == [14, 15]

    def test_keep_zero_keeps_everything(self, tmp_path):
        from tacotron2_tpu.train.loop import _prune_epoch_ckpts
        run_saved = []
        for n in range(1, 5):
            (tmp_path / f"tacotron2_epoch_{n}").mkdir()
            run_saved.append(n)

        class Log:
            def log(self, msg):
                pass

        _prune_epoch_ckpts(str(tmp_path), 0, Log(), run_saved)
        assert len(list(tmp_path.iterdir())) == 4
