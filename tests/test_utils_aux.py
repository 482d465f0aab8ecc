"""Auxiliary utils: profiling timer, debug hooks, image helpers, fps bench."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_step_timer():
    from gaussianavatars_tpu.utils.profiling import StepTimer

    t = StepTimer(sync_every=3)
    x = jnp.ones((8, 8))
    samples = [t.step(sync_on=x) for _ in range(7)]
    assert samples[0] is None and samples[1] is None
    assert samples[2] is not None and samples[2] > 0
    assert samples[5] is not None


def test_assert_finite():
    from gaussianavatars_tpu.utils.debug import assert_finite

    assert_finite({"a": jnp.ones(3), "b": jnp.zeros(2)})
    with pytest.raises(FloatingPointError, match="bad"):
        assert_finite({"bad": jnp.array([1.0, np.nan])}, name="bad")


def test_checked_catches_nan():
    from gaussianavatars_tpu.utils.debug import checked

    f = checked(lambda x: jnp.log(x) * 2.0)
    err, out = jax.jit(f)(jnp.array([-1.0]))
    assert err.get() is not None  # nan produced → error recorded
    err2, out2 = jax.jit(f)(jnp.array([1.0]))
    assert err2.get() is None


def test_error_map():
    from gaussianavatars_tpu.utils.image import error_map, mse, psnr

    a = np.zeros((8, 8, 3))
    b = np.ones((8, 8, 3)) * 0.5
    m = error_map(a, b)
    assert m.shape == (8, 8, 3) and np.isfinite(m).all()
    assert mse(a, a) == 0 and psnr(a, b) == pytest.approx(6.02, abs=0.1)


def test_fps_benchmark_runs(tmp_path):
    """fps_benchmark_demo end-to-end on a tiny avatar (CPU, tiny iter count)."""
    import os, sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from fixtures_avatar import make_flame_model, reference_avatar
    from gaussianavatars_tpu.data.scene import Scene
    from gaussianavatars_tpu.models.flame.assets import save_assets
    from fixtures_avatar import write_rendered_dataset

    model = make_flame_model(tmp_path)
    params, aux = reference_avatar(model)
    write_rendered_dataset(str(tmp_path / "ds"), model, params, aux, timesteps=1, cams=1)
    mp = str(tmp_path / "model")
    os.makedirs(mp)
    save_assets(model.assets, os.path.join(mp, "flame_assets.npz"))
    scene = Scene(str(tmp_path / "ds"), model_path=mp, num_verts_hint=model.num_verts)
    ply = scene.save(1, params, aux, flame_param=scene.flame_table)

    from gaussianavatars_tpu.viewers.local import AvatarViewerCore
    import fps_benchmark_demo as fbd

    core = AvatarViewerCore(
        ply, width=64, height=48, use_pallas=False,
        tile=dict(tile_h=8, tile_w=16, capacity=128, max_tiles_per_gaussian=8),
    )
    fps = fbd.run_benchmark(core, n_iter=3, n_rounds=2)
    assert len(fps) == 2 and all(f > 0 for f in fps)
