from . import affine, graph, heatmap, pos_enc, softargmax, warp
