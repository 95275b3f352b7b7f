#!/usr/bin/env python
"""Web demo (gradio).

Reference surface: app.py + gradio_utils/utils.py — draw keypoints and
skeleton edges on a support image, upload a query, get predictions with
learned edge weights rendered as line widths. Gradio is not part of the
baked TPU image, so the app is import-gated; the underlying inference path
is the same one demo.py uses (PoseEstimator.forward_batch).
"""

from __future__ import annotations

import json
import sys
import tempfile

import numpy as np


def build_interface(checkpoint=None, backbone_ckpt=None, size=256):
    import gradio as gr

    from demo import run_inference

    state = {"points": [], "edges": []}

    def add_point(img, evt: "gr.SelectData"):
        state["points"].append([evt.index[0], evt.index[1]])
        return f"{len(state['points'])} keypoints"

    def add_edge(i, j):
        state["edges"].append([int(i), int(j)])
        return f"{len(state['edges'])} edges"

    def reset():
        state["points"], state["edges"] = [], []
        return "cleared"

    def infer(support_img, query_img):
        ann = {"keypoints": state["points"], "skeleton": state["edges"]}
        return run_inference(support_img, query_img, ann,
                             checkpoint=checkpoint,
                             backbone_ckpt=backbone_ckpt, size=size)

    with gr.Blocks(title="EdgeCape-TPU") as demo_ui:
        gr.Markdown("# EdgeCape-TPU: one-shot keypoint transfer\n"
                    "Click keypoints on the support image, add skeleton "
                    "edges by index, then run on a query image.")
        with gr.Row():
            support = gr.Image(label="support", type="numpy")
            query = gr.Image(label="query", type="numpy")
            out = gr.Image(label="result")
        status = gr.Textbox(label="status")
        with gr.Row():
            i_box = gr.Number(label="edge i", value=0)
            j_box = gr.Number(label="edge j", value=1)
            edge_btn = gr.Button("add edge")
            reset_btn = gr.Button("reset")
            run_btn = gr.Button("run")
        support.select(add_point, [support], [status])
        edge_btn.click(add_edge, [i_box, j_box], [status])
        reset_btn.click(reset, [], [status])
        run_btn.click(infer, [support, query], [out])
    return demo_ui


def main():
    from edgecape_tpu.utils.runtime import honor_env_platforms
    honor_env_platforms()
    ckpt = sys.argv[1] if len(sys.argv) > 1 else None
    try:
        import gradio  # noqa: F401
    except ImportError:
        # fall back to the dependency-free interactive web UI served by
        # serve.py (GET / — click keypoints + edges in the browser);
        # same inference path, no gradio required
        print("gradio is not installed; starting the stdlib web UI "
              "(serve.py) instead — open http://localhost:8300/")
        import serve
        service = serve.PoseService(checkpoint=ckpt)
        from http.server import ThreadingHTTPServer
        httpd = ThreadingHTTPServer(("0.0.0.0", 8300),
                                    serve.make_handler(service))
        httpd.serve_forever()
        return
    build_interface(checkpoint=ckpt).launch()


if __name__ == "__main__":
    main()
