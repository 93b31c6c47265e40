"""Medium (Beer-Lambert) + metrics/observability tests."""
import io
import numpy as np
import jax.numpy as jnp

from kazen_tpu.shade.medium import make_nonscatter, transmission
from kazen_tpu.utils.metrics import Progress, RenderMetrics, PassMetrics, timed


def test_nonscatter_medium():
    m = make_nonscatter((0.5, 0.25, 1.0), distance=2.0)
    tr = np.asarray(transmission(m, jnp.asarray([2.0])))
    np.testing.assert_allclose(tr[0], [0.5, 0.25, 1.0], rtol=1e-5)
    tr = np.asarray(transmission(m, jnp.asarray([4.0])))
    np.testing.assert_allclose(tr[0], [0.25, 0.0625, 1.0], rtol=1e-5)


def test_metrics_collection():
    import scenes
    from kazen_tpu.scene.compiler import compile_scene
    from kazen_tpu.integrate.render import render

    scene = scenes.cornell_box(width=8, height=8, spp=2)
    arrays, static = compile_scene(scene)
    metrics = RenderMetrics()
    img = np.asarray(render(arrays, static, spp=2, metrics=metrics))
    s = metrics.summary()
    assert s["passes"] == 2
    assert s["rays"] > 8 * 8 * 2  # at least one bounce each
    assert s["rays_per_s"] > 0


def test_progress_line():
    buf = io.StringIO()
    p = Progress(4, stream=buf)
    for i in range(1, 5):
        p._last = 0.0
        p.update(i)
    out = buf.getvalue()
    assert "4/4" in out


def test_timed():
    buf = io.StringIO()
    with timed("thing", stream=buf):
        pass
    assert "thing" in buf.getvalue()
