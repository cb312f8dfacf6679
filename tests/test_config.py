"""Config system tests: defaults, interpolation, CLI overrides, validation."""

import pytest

from vectorquantizedcpc_tpu.configs import (
    ConfGlobal,
    load_conf,
    parse_cli_overrides,
)


def test_defaults_load():
    conf = load_conf([])
    assert isinstance(conf, ConfGlobal)
    assert conf.seed == 13
    assert conf.sampling_rate == 16000
    assert conf.model.encoder.in_channels == 80  # ${dim_mel_freq}
    assert conf.model.encoder.n_embeddings == 512
    assert conf.model.cpc.n_prediction_steps == 12
    assert conf.training.cpc.scheduler.milestones == [20000]
    assert conf.training.cpc.scheduler.initial_lr == pytest.approx(1e-5)


def test_interpolation_chains():
    conf = load_conf([])
    # preprocess.hop_length <- mel_stft_stride; rnnms.upsampling_t <- hop_length
    assert conf.data.dataset.preprocess.hop_length == 160
    assert conf.training_vocoder.model.network.rnnms.upsampling_t == 160
    assert conf.training_vocoder.model.network.rnnms.bits_mu_law == 8


def test_derived_fields():
    conf = load_conf([])
    # dim_i_feature = 64 + 64 (reference config.py:197-199)
    assert conf.training_vocoder.model.network.rnnms.dim_i_feature == 128
    # clip_length_mel = 128 + 12 (reference config.py:201-202)
    assert conf.data.dataset.cpc.clip_length_mel == 140
    assert conf.training_vocoder.model.network.n_speakers == 102


def test_cli_override_scalar():
    conf = load_conf(["training.cpc.n_epochs=500", "seed=7"])
    assert conf.training.cpc.n_epochs == 500
    assert conf.seed == 7


def test_cli_override_propagates_through_interpolation():
    conf = load_conf(["dim_latent=32"])
    assert conf.model.encoder.z_dim == 32
    assert conf.model.cpc.z_dim == 32
    assert conf.training_vocoder.model.network.dim_i_embedding == 32
    # Derived field follows.
    assert conf.training_vocoder.model.network.rnnms.dim_i_feature == 32 + 64


def test_cli_override_list_and_types():
    conf = load_conf(["training.cpc.scheduler.milestones=[100, 200]"])
    assert conf.training.cpc.scheduler.milestones == [100, 200]
    conf = load_conf(["save_auxiliary=true"])
    assert conf.save_auxiliary is True


def test_extend_conf_yaml(tmp_path):
    p = tmp_path / "ext.yaml"
    p.write_text("training:\n    cpc:\n        n_epochs: 42\nseed: 99\n")
    conf = load_conf([f"path_extend_conf={p}", "seed=1"])
    assert conf.training.cpc.n_epochs == 42
    # CLI beats extend yaml.
    assert conf.seed == 1


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="Unknown config key"):
        load_conf(["model.encoder.bogus_key=1"])


def test_type_validation():
    with pytest.raises(ValueError, match="Expected int"):
        load_conf(["seed=notanint"])


def test_parse_cli_overrides_nested():
    tree = parse_cli_overrides(["a.b.c=3", "a.b.d=x", "e=[1,2]"])
    assert tree == {"a": {"b": {"c": 3, "d": "x"}}, "e": [1, 2]}


def test_bad_override_format():
    with pytest.raises(ValueError, match="key=value"):
        load_conf(["justakey"])
