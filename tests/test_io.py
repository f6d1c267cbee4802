"""Checkpoint loading (safetensors + embedded cfg -> pytree) and host audio
utilities, validated against the reference implementations."""

import numpy as np
import pytest

from sopro_tpu import audio as A
from sopro_tpu import hub as H
from sopro_tpu.config import SoproTTSConfig

from tests import torch_ref as TR
from tests.test_model_parity import CFG, _FakeTok


def test_sopro_checkpoint_roundtrip(tmp_path, rng):
    """Save a reference-named state dict with cfg metadata, load through the
    hub path, and get the exact same pytree the live-module converter gives."""
    TR.import_ref()
    import json
    import torch
    from sopro.config import SoproTTSConfig as RefCfg
    from sopro.model import SoproTTSModel

    torch.manual_seed(11)
    rcfg = RefCfg(**CFG)
    m = SoproTTSModel(rcfg, _FakeTok()).eval()

    flat = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    path = str(tmp_path / "model.safetensors")
    cfg_json = json.dumps({**CFG, "bogus_unknown_key": 123})
    H.write_safetensors(path, flat, metadata={"cfg": cfg_json})

    cfg, params = H.load_sopro_checkpoint(path)
    assert isinstance(cfg, SoproTTSConfig)
    assert cfg.d_model == CFG["d_model"]
    assert cfg.ar_dilation_cycle == CFG["ar_dilation_cycle"]

    expected = TR.conv_sopro_model(m)

    import jax

    leaves_a, tree_a = jax.tree.flatten(params)
    leaves_b, tree_b = jax.tree.flatten(expected)
    assert tree_a == tree_b
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_checkpoint_loads_in_reference(tmp_path):
    """Checkpoints written by our trainer load into the reference torch model
    with strict=True — full round-trip interoperability."""
    TR.import_ref()
    import torch
    from sopro.config import SoproTTSConfig as RefCfg
    from sopro.hub import load_cfg_from_safetensors as ref_load_cfg
    from sopro.model import SoproTTSModel

    torch.manual_seed(13)
    rcfg = RefCfg(**CFG)
    m = SoproTTSModel(rcfg, _FakeTok()).eval()
    params = TR.conv_sopro_model(m)
    cfg = SoproTTSConfig(**CFG)

    path = str(tmp_path / "model.safetensors")
    H.save_sopro_checkpoint(path, params, cfg)

    # reference-side: cfg parses, state dict loads strictly and matches
    assert ref_load_cfg(path).d_model == CFG["d_model"]
    from safetensors.torch import load_file

    m2 = SoproTTSModel(rcfg, _FakeTok())
    missing_unexpected = m2.load_state_dict(load_file(path), strict=True)
    state = m.state_dict()
    for k, v in m2.state_dict().items():
        np.testing.assert_array_equal(v.numpy(), state[k].numpy())

    # our-side roundtrip is identical too
    cfg2, params2 = H.load_sopro_checkpoint(path)
    import jax

    for a, b in zip(jax.tree.leaves(params2), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_converter_full_coverage():
    """Every tensor in a full reference `state_dict()` is consumed by the
    converter — a from-scratch name-mapper must not silently drop a weight
    (worse failure mode than the reference's strict=False load,
    reference: src/sopro/model.py:446)."""
    TR.import_ref()
    import torch
    from sopro.config import SoproTTSConfig as RefCfg
    from sopro.model import SoproTTSModel

    torch.manual_seed(7)
    m = SoproTTSModel(RefCfg(**CFG), _FakeTok()).eval()
    flat = H.TrackedStateDict(
        {k: v.detach().numpy() for k, v in m.state_dict().items()}
    )
    H.sopro_params_from_flat(flat, SoproTTSConfig(**CFG))
    assert flat.unconsumed() == []


def test_checkpoint_load_flags_extra_and_missing(tmp_path):
    """A corrupted tensor name is LOUD: the missing tensor aborts the load
    naming it; an extra tensor warns (or raises with on_unconsumed='raise')."""
    TR.import_ref()
    import json
    import torch
    from sopro.config import SoproTTSConfig as RefCfg
    from sopro.model import SoproTTSModel

    torch.manual_seed(9)
    m = SoproTTSModel(RefCfg(**CFG), _FakeTok()).eval()
    flat = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    meta = {"cfg": json.dumps(CFG)}

    # extra tensor -> warning by default, error when asked to be strict
    extra = dict(flat)
    extra["bogus.extra_weight"] = np.zeros((3,), np.float32)
    p1 = str(tmp_path / "extra.safetensors")
    H.write_safetensors(p1, extra, metadata=meta)
    with pytest.warns(UserWarning, match="bogus.extra_weight"):
        H.load_sopro_checkpoint(p1)
    with pytest.raises(RuntimeError, match="not consumed"):
        H.load_sopro_checkpoint(p1, on_unconsumed="raise")

    # renamed (i.e. missing) tensor -> refuses the partial load, names it
    renamed = dict(flat)
    renamed["ar.head.weight_TYPO"] = renamed.pop("ar.head.weight")
    p2 = str(tmp_path / "renamed.safetensors")
    H.write_safetensors(p2, renamed, metadata=meta)
    with pytest.raises(RuntimeError, match="ar.head.weight"):
        H.load_sopro_checkpoint(p2)


def test_metadata_reader(tmp_path):
    H.write_safetensors(
        str(tmp_path / "m.safetensors"),
        {"x": np.zeros((2, 2), np.float32)},
        metadata={"cfg": "{}", "other": "1"},
    )
    meta = H.read_safetensors_metadata(str(tmp_path / "m.safetensors"))
    assert meta == {"cfg": "{}", "other": "1"}


def test_wav_roundtrip(tmp_path, rng):
    wav = (rng.standard_normal(24000) * 0.3).astype(np.float32)
    p = str(tmp_path / "a.wav")
    A.save_audio(p, wav, 24000)
    out, sr = A.load_audio_file(p)
    assert sr == 24000
    assert out.shape == wav.shape
    np.testing.assert_allclose(out, np.clip(wav, -1, 1), atol=1.5 / 32768)


def test_resample_ratio(rng):
    wav = rng.standard_normal(16000).astype(np.float32)
    out = A.resample(wav, 16000, 24000)
    assert out.shape[0] == 24000
    assert A.resample(wav, 16000, 16000) is not None


def test_trim_silence_parity(rng):
    """Against the reference's torch implementation on a synthetic signal."""
    TR.import_ref()
    import torch
    from sopro.audio import trim_silence_energy as ref_trim

    sr = 24000
    sig = np.zeros(3 * sr, np.float32)
    sig[sr : 2 * sr] = (rng.standard_normal(sr) * 0.5).astype(np.float32)
    ours = A.trim_silence_energy(sig, sr)
    ref = ref_trim(torch.from_numpy(sig), sr).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)

    # all-silence input is returned unchanged
    quiet = np.zeros(sr, np.float32)
    assert A.trim_silence_energy(quiet, sr).shape == quiet.shape


def test_center_crop():
    wav = np.arange(100, dtype=np.float32)
    out = A.center_crop_audio(wav, 50)
    assert out.shape == (50,)
    np.testing.assert_array_equal(out, wav[25:75])
    assert A.center_crop_audio(wav, 200).shape == (100,)
    assert A.center_crop_audio(wav, 0).shape == (100,)
