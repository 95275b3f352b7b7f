import jax


def test_backend_is_cpu():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8
