# Submodules are imported lazily by consumers (edgecape_tpu.models.dinov2,
# .transformer, .skeleton, .head, .edgecape) to keep import costs low and
# avoid circular imports.
