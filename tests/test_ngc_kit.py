"""NGC-checkpoint readiness kit (tools/verify_ngc_checkpoint.py).

The real NVIDIA NGC generator can never be downloaded in this
environment (zero egress — reference: inference.py:40-54), so the kit is
exercised end-to-end against a synthetic weight-normed checkpoint in the
NGC layout: the verification that will run the moment a real file is
supplied.
"""

import importlib.util
import os
import json
import subprocess
import sys

import numpy as np
import pytest


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "verify_ngc_checkpoint", "tools/verify_ngc_checkpoint.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_ngc_style_checkpoint(torch, path, weight_norm=True, seed=5):
    from tests.test_hifigan import _build_torch_hifigan
    torch.manual_seed(seed)
    gen = _build_torch_hifigan(torch)
    if weight_norm:
        for m in gen.modules():
            if isinstance(m, (torch.nn.Conv1d, torch.nn.ConvTranspose1d)):
                torch.nn.utils.parametrizations.weight_norm(m)
    sd = {}
    for k, v in gen.state_dict().items():
        k = k.replace("parametrizations.weight.original0", "weight_g")
        k = k.replace("parametrizations.weight.original1", "weight_v")
        sd[k] = v.detach().clone()
    torch.save({"generator": sd}, path)
    return sd


class TestManifest:
    def test_committed_manifest_matches_generated(self):
        tool = _load_tool()
        committed = json.load(open("docs/ngc_hifigan_manifest.json"))
        assert committed == json.loads(
            json.dumps(tool.expected_manifest()))  # int/list normalization

    def test_manifest_covers_synthetic_checkpoint_exactly(self):
        torch = pytest.importorskip("torch")
        tool = _load_tool()
        from tests.test_hifigan import _build_torch_hifigan
        torch.manual_seed(0)
        sd = {k: v.numpy() for k, v in
              _build_torch_hifigan(torch).state_dict().items()}
        assert tool.check_keys(sd, tool.expected_manifest()) == []

    def test_detects_missing_and_extra_and_misshapen(self):
        torch = pytest.importorskip("torch")
        tool = _load_tool()
        from tests.test_hifigan import _build_torch_hifigan
        torch.manual_seed(0)
        sd = {k: v.numpy() for k, v in
              _build_torch_hifigan(torch).state_dict().items()}
        del sd["conv_post.bias"]
        sd["extra.weight"] = np.zeros((2, 2, 2), np.float32)
        sd["conv_pre.weight"] = sd["conv_pre.weight"][:, :79]
        problems = tool.check_keys(sd, tool.expected_manifest())
        text = "\n".join(problems)
        assert "missing conv_post.bias" in text
        assert "unexpected key extra.weight" in text
        assert "conv_pre.weight: shape" in text


class TestVerifyEndToEnd:
    def test_weight_normed_checkpoint_passes(self, tmp_path):
        torch = pytest.importorskip("torch")
        tool = _load_tool()
        path = str(tmp_path / "hifigan_gen_checkpoint_synth.pt")
        _make_ngc_style_checkpoint(torch, path, weight_norm=True)
        report = tool.verify(path, torch_parity=True)
        assert report["ok"], report
        assert report["layout"] == "weight_normed"
        assert report["manifest_problems"] == []
        assert report["torch_parity"]["max_abs_delta"] < 2e-4
        assert len(report["sha256"]) == 64
        assert report["n_params"] > 13_000_000   # v1 generator ~13.9 M

    def test_plain_checkpoint_passes(self, tmp_path):
        torch = pytest.importorskip("torch")
        tool = _load_tool()
        path = str(tmp_path / "hifigan_plain.pt")
        _make_ngc_style_checkpoint(torch, path, weight_norm=False)
        report = tool.verify(path, torch_parity=True)
        assert report["ok"], report
        assert report["layout"] == "plain"

    def test_corrupted_checkpoint_fails_with_named_problems(self, tmp_path):
        torch = pytest.importorskip("torch")
        tool = _load_tool()
        from tests.test_hifigan import _build_torch_hifigan
        torch.manual_seed(7)
        gen = _build_torch_hifigan(torch)
        sd = {k: v.detach().clone() for k, v in gen.state_dict().items()}
        del sd["ups.2.bias"]
        path = str(tmp_path / "bad.pt")
        torch.save({"generator": sd}, path)
        report = tool.verify(path, torch_parity=False)
        assert not report["ok"]
        assert any("ups.2.bias" in p for p in report["manifest_problems"])

    def test_cli_exit_codes(self, tmp_path):
        torch = pytest.importorskip("torch")
        good = str(tmp_path / "good.pt")
        _make_ngc_style_checkpoint(torch, good, weight_norm=True)
        env_cmd = [sys.executable, "tools/verify_ngc_checkpoint.py", good,
                   "--no-torch-parity",
                   "--out", str(tmp_path / "report.json")]
        # keep the subprocess off the (possibly contended) TPU tunnel
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(env_cmd, capture_output=True, text=True,
                              timeout=600, env=env)
        assert proc.returncode == 0, proc.stderr[-2000:]
        report = json.load(open(tmp_path / "report.json"))
        assert report["ok"]
