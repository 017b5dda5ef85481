"""Typed config system: env tier, variant tier, key=value file tier."""

from genarchbench_tpu.core.config import (EnvConfig, KernelVariants,
                                          load_kv_config)


def test_env_config_defaults_and_parse():
    cfg = EnvConfig.from_env({})
    assert cfg.devices == 1 and cfg.inputs_root is None
    cfg = EnvConfig.from_env({
        "GENARCH_BENCH_INPUTS_ROOT": "/data",
        "GENARCH_DEVICES": "8",
        "GENARCH_HOSTS": "2",
        "GENARCH_REGRESS_TIMEOUT": "60.5",
    })
    assert cfg.inputs_root == "/data"
    assert cfg.devices == 8 and cfg.hosts == 2
    assert cfg.regress_timeout_s == 60.5
    # malformed ints fall back to defaults
    cfg = EnvConfig.from_env({"GENARCH_DEVICES": "lots"})
    assert cfg.devices == 1


def test_kernel_variants_defaults():
    v = KernelVariants()
    assert v.kmer_count_version == 3 and v.chain_with_heuristics


def test_load_kv_config_include_and_comments(tmp_path):
    (tmp_path / "base.cfg").write_text(
        "kmer_size = 15\nshared = base\n")
    (tmp_path / "main.cfg").write_text(
        "# a comment\n"
        "%include base.cfg\n"
        "use_minimizers = 0   # trailing comment\n"
        "shared = main\n")
    cfg = load_kv_config(str(tmp_path / "main.cfg"))
    assert cfg["kmer_size"] == "15"
    assert cfg["use_minimizers"] == "0"
    assert cfg["shared"] == "main"        # later keys win


def test_kmer_parse_config_delegates(tmp_path):
    from genarchbench_tpu.kernels.kmer import parse_config
    (tmp_path / "c.cfg").write_text("kmer_size=17\n")
    assert parse_config(str(tmp_path / "c.cfg"))["kmer_size"] == "17"
