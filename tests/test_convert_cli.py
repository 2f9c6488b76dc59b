"""Checkpoint conversion CLI roundtrip: torch .pth -> orbax -> torch .pth."""

import numpy as np
import pytest

from tacotron2_tpu.config import Config


class TestConvertRoundtrip:
    def test_torch_to_jax_to_torch(self, tmp_path):
        torch = pytest.importorskip("torch")
        import convert_checkpoint as cc
        from tacotron2_tpu.utils.torch_compat import \
            torch_state_dict_from_params
        from tacotron2_tpu.models import tacotron2_init
        import jax

        # synthesize a reference-layout checkpoint from our own params
        params, state = tacotron2_init(jax.random.PRNGKey(0),
                                       Config().model)
        sd_np = torch_state_dict_from_params(params, state, Config().model)
        src = str(tmp_path / "ref.pth")
        torch.save({"model_state_dict":
                    {k: torch.from_numpy(v.copy())
                     for k, v in sd_np.items()}}, src)

        mid = str(tmp_path / "orbax_ckpt")
        cc.torch2jax(src, mid)

        back = str(tmp_path / "back.pth")
        cc.jax2torch(mid, back)

        sd2 = torch.load(back, weights_only=False)["model_state_dict"]
        assert set(sd2.keys()) == set(sd_np.keys())
        for k in sd_np:
            np.testing.assert_array_equal(sd_np[k], sd2[k].numpy())
