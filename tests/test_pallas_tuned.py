"""Measured-defaults sidecar (pallas_tuned.json) precedence:
set_*() > EDGECAPE_* env > tuned file > False."""

import json

from edgecape_tpu.ops import pallas_config as pc


def _with_tuned(tmp_path, monkeypatch, switches):
    p = tmp_path / "pallas_tuned.json"
    p.write_text(json.dumps({"switches": switches}))
    monkeypatch.setenv("EDGECAPE_PALLAS_TUNED", str(p))
    pc.reload_tuned()
    return p


def test_tuned_file_sets_defaults(tmp_path, monkeypatch):
    _with_tuned(tmp_path, monkeypatch,
                {"encoder_stack": True, "decoder_stack": False,
                 "vit_pair_blocks": True})
    try:
        assert pc.encoder_stack_default() is True
        assert pc.decoder_stack_default() is False
        assert pc.vit_pair_blocks_default() is True
    finally:
        pc.reload_tuned()


def test_env_overrides_tuned(tmp_path, monkeypatch):
    _with_tuned(tmp_path, monkeypatch, {"encoder_stack": True})
    monkeypatch.setenv("EDGECAPE_ENC_STACK", "0")
    try:
        assert pc.encoder_stack_default() is False
    finally:
        pc.reload_tuned()


def test_setter_overrides_env_and_tuned(tmp_path, monkeypatch):
    _with_tuned(tmp_path, monkeypatch, {"decoder_stack": False})
    monkeypatch.setenv("EDGECAPE_DEC_STACK", "0")
    pc.set_decoder_stack(True)
    try:
        assert pc.decoder_stack_default() is True
    finally:
        pc.set_decoder_stack(None)
        pc.reload_tuned()
    assert pc.decoder_stack_default() is False  # env wins again


def test_missing_or_bad_file_is_false(tmp_path, monkeypatch):
    monkeypatch.setenv("EDGECAPE_PALLAS_TUNED",
                       str(tmp_path / "nope.json"))
    pc.reload_tuned()
    try:
        assert pc.encoder_stack_default() is False
        bad = tmp_path / "bad.json"
        bad.write_text("{not json")
        monkeypatch.setenv("EDGECAPE_PALLAS_TUNED", str(bad))
        pc.reload_tuned()
        assert pc.decoder_stack_default() is False
    finally:
        pc.reload_tuned()
