"""Layered config tests (utils/config/GATKConfig.java semantics)."""
import os

from gatk_tpu.utils.config import GATKConfig


def test_layering(tmp_path, monkeypatch):
    f = tmp_path / "gatk.properties"
    f.write_text("# comment\npairhmm.device_bucket_max = 512\ncustom.key: hello\n")
    cfg = GATKConfig(str(f))
    # file overrides default
    assert cfg.get_int("pairhmm.device_bucket_max") == 512
    # default survives when not in file
    assert cfg.get_bool("pairhmm.f64_fallback") is True
    assert cfg.get("custom.key") == "hello"
    # env overrides file
    monkeypatch.setenv("GATK_TPU_PAIRHMM_DEVICE_BUCKET_MAX", "256")
    assert cfg.get_int("pairhmm.device_bucket_max") == 256
    # typed accessors
    assert cfg.get_int("cloudPrefetchBuffer") == 40
    assert cfg.get_list("codec_packages") == ["gatk_tpu.io"]
    assert cfg.get("missing", "fallback") == "fallback"
