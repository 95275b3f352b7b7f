"""Execute the gradio-present branch of app.py under a stub gradio module.

The real gradio package is not in the TPU image, so the import-gated UI
glue (app.py:20-64, reference app.py:27-190) otherwise never runs. The
stub below records component construction and event wiring so the test
drives the exact callbacks a browser click would: point selection, edge
entry, reset, and inference dispatch into demo.run_inference.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest


class _Component:
    """Records .select()/.click() wirings like a gradio component."""

    def __init__(self, kind, **kwargs):
        self.kind = kind
        self.kwargs = kwargs
        self.handlers = {}

    def select(self, fn, inputs, outputs):
        self.handlers["select"] = (fn, inputs, outputs)

    def click(self, fn, inputs, outputs):
        self.handlers["click"] = (fn, inputs, outputs)


class _Ctx:
    """Context-manager container (Blocks / Row)."""

    def __init__(self, kind, registry, **kwargs):
        self.kind = kind
        self.kwargs = kwargs
        self._registry = registry
        self.launched = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def launch(self, **kwargs):
        self.launched = True
        self._registry["launched"].append(self)


class _SelectData:
    def __init__(self, index):
        self.index = index


def _make_stub_gradio(registry):
    gr = types.ModuleType("gradio")

    def _component(kind):
        def make(*args, **kwargs):
            comp = _Component(kind, **kwargs)
            registry["components"].append(comp)
            return comp
        return make

    gr.Blocks = lambda **kw: registry["blocks"].append(
        _Ctx("Blocks", registry, **kw)) or registry["blocks"][-1]
    gr.Row = lambda **kw: _Ctx("Row", registry, **kw)
    gr.Markdown = _component("Markdown")
    gr.Image = _component("Image")
    gr.Textbox = _component("Textbox")
    gr.Number = _component("Number")
    gr.Button = _component("Button")
    gr.SelectData = _SelectData
    return gr


@pytest.fixture()
def stub_gradio(monkeypatch):
    registry = {"components": [], "blocks": [], "launched": []}
    monkeypatch.setitem(sys.modules, "gradio", _make_stub_gradio(registry))
    return registry


def _component_map(registry):
    by_label = {}
    for comp in registry["components"]:
        label = comp.kwargs.get("label")
        if label is not None:
            by_label.setdefault(label, comp)
    return by_label


def test_build_interface_wires_callbacks(stub_gradio, monkeypatch):
    calls = []

    import demo

    def fake_run_inference(support_img, query_img, annotation, **kwargs):
        calls.append((support_img.shape, query_img.shape,
                      annotation, kwargs))
        return "out.png"

    monkeypatch.setattr(demo, "run_inference", fake_run_inference)

    import app
    ui = app.build_interface(checkpoint="ckpt_dir", size=256)
    assert ui.launched is False

    comps = _component_map(stub_gradio)
    assert {"support", "query", "result", "status"} <= set(comps)

    # click 3 keypoints on the support image
    select_fn = comps["support"].handlers["select"][0]
    img = np.zeros((64, 64, 3), np.uint8)
    for xy in ([4, 5], [10, 12], [30, 31]):
        status = select_fn(img, _SelectData(xy))
    assert status == "3 keypoints"

    # add two skeleton edges through the Number boxes' button
    buttons = [c for c in stub_gradio["components"] if c.kind == "Button"]
    # construction order in app.py: add edge / reset / run
    edge_btn, reset_btn, run_btn = buttons
    edge_fn = edge_btn.handlers["click"][0]
    assert edge_fn(0, 1) == "1 edges"
    assert edge_fn(1.0, 2.0) == "2 edges"

    # run inference: the state accumulated above must flow through
    infer_fn = run_btn.handlers["click"][0]
    result = infer_fn(img, img + 1)
    assert result == "out.png"
    (s_shape, q_shape, ann, kwargs), = calls
    assert s_shape == (64, 64, 3) and q_shape == (64, 64, 3)
    assert ann["keypoints"] == [[4, 5], [10, 12], [30, 31]]
    assert ann["skeleton"] == [[0, 1], [1, 2]]
    assert kwargs["checkpoint"] == "ckpt_dir"
    assert kwargs["size"] == 256

    # reset clears the annotation state
    reset_fn = reset_btn.handlers["click"][0]
    assert reset_fn() == "cleared"
    infer_fn(img, img)
    assert calls[-1][2]["keypoints"] == []
    assert calls[-1][2]["skeleton"] == []


def test_main_gradio_branch_launches(stub_gradio, monkeypatch):
    import app
    monkeypatch.setattr(sys, "argv", ["app.py"])
    app.main()
    assert len(stub_gradio["launched"]) == 1
    assert stub_gradio["launched"][0].launched
