"""Override coercion for the tri-state use_flash field (ADVICE round 4):
`--cfg-options model.use_flash=False` on a config that leaves use_flash
None must store a real bool — the string 'False' would later resolve
TRUTHY and silently enable Pallas in strict-parity mode."""

import pytest

from edgecape_tpu.config import Config, resolve_use_flash


def test_optional_bool_override_coerces_strings():
    cfg = Config()
    assert cfg.model.use_flash is None            # tri-state default
    assert cfg.override(["model.use_flash=False"]).model.use_flash is False
    assert cfg.override(["model.use_flash=false"]).model.use_flash is False
    assert cfg.override(["model.use_flash=true"]).model.use_flash is True
    assert cfg.override(["model.use_flash=null"]).model.use_flash is None
    assert cfg.override(["model.use_flash=none"]).model.use_flash is None


def test_optional_bool_override_rejects_garbage():
    with pytest.raises(ValueError):
        Config().override(["model.use_flash=maybe"])


def test_plain_bool_override_rejects_none():
    with pytest.raises(ValueError):
        Config().override(["model.learn_skeleton=null"])


def test_resolve_use_flash_rejects_non_bool():
    import dataclasses

    cfg = Config()
    model = dataclasses.replace(cfg.model)
    object.__setattr__(model, "use_flash", "False")   # simulate bad state
    with pytest.raises(TypeError):
        resolve_use_flash(model)


def test_explicit_false_resolves_false():
    cfg = Config().override(["model.use_flash=False"])
    assert resolve_use_flash(cfg.model) is False
