"""On-chip checks for the round-3 physics addenda (docs/ACOUSTICS.md):
edge diffraction + air absorption inside the compiled streaming chunk
step (fused trace underneath), and directive sources/mics (in-kernel on
the fused paths since round 3). Mirrors the CPU assertions of
tests/test_diffraction.py / tests/test_directivity.py on the real
backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from realisticaudioraytracing2d_tpu.engine import trace_accumulate
from realisticaudioraytracing2d_tpu.models.materials import AudioMaterial
from realisticaudioraytracing2d_tpu.models.scene import SceneBuilder
from realisticaudioraytracing2d_tpu.ops import directivity as dv
from realisticaudioraytracing2d_tpu.ops.ir import IRState
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams
from realisticaudioraytracing2d_tpu.streaming import (init_stream,
                                                      stream_chunk)

SR = 8000
OPAQUE = AudioMaterial(absorption=0.9, scattering=0.5, transmission=0.0,
                       ior=1.0)


def barrier_scene(pad_to=None):
    b = SceneBuilder(n_bands=1)
    b.add_segment((0.0, -4.0), (0.0, 4.0), (1.0, 0.0), OPAQUE)
    return b.build(pad_to=pad_to)


def test_stream_chunk_diffraction_air_on_chip():
    # The barrier shadow is exactly silent through the FUSED trace; the
    # in-jit diffraction fill and air attenuation behave as on CPU.
    scene = barrier_scene()
    p = TraceParams.make(np.float32([-3.0, 0.0]), np.float32([3.0, 0.0]),
                         listener_radius=0.5)
    dry = jnp.ones(256, jnp.float32)
    key = jax.random.PRNGKey(0)
    kw = dict(n_rays=256, max_bounces=2, sample_rate=SR)

    out_plain, _ = stream_chunk(scene, p, init_stream(1024, 256), dry,
                                key, **kw)
    assert float(jnp.abs(out_plain).sum()) == 0.0

    out_diff, _ = stream_chunk(scene, p, init_stream(1024, 256), dry,
                               key, diffraction=True, **kw)
    e_diff = float(jnp.abs(out_diff).sum())
    assert e_diff > 0.0 and np.isfinite(e_diff)

    out_air, _ = stream_chunk(scene, p, init_stream(1024, 256), dry, key,
                              diffraction=True,
                              air_alpha=jnp.asarray([5.0]), **kw)
    assert 0.0 < float(jnp.abs(out_air).sum()) < e_diff


def far_field():
    m = AudioMaterial(absorption=1.0, scattering=0.0, transmission=0.0,
                      ior=1.0)
    b = SceneBuilder(n_bands=1)
    b.add_segment((500.0, -1.0), (500.0, 1.0), (1.0, 0.0), m)
    return b.build()


def _energy(scene, directivity, mic, listener):
    p = TraceParams.make(np.float32([0.0, 0.0]), np.float32(listener),
                         listener_radius=0.5, directivity=directivity,
                         mic_directivity=mic)
    st = trace_accumulate(scene, p, IRState.zeros(2048),
                          jax.random.PRNGKey(0), n_rays=2048,
                          max_bounces=2, sample_rate=SR)
    return float(np.asarray(st.sum).sum())


def test_directivity_on_chip():
    # Directive sources/mics route to the jnp oracle, which must compile
    # and hold its CPU-proven invariants on the TPU backend too.
    scene = far_field()
    omni = _energy(scene, None, None, (5.0, 0.0))
    card = _energy(scene, dv.cardioid(0.0), None, (5.0, 0.0))
    back = _energy(scene, dv.cardioid(np.pi), None, (5.0, 0.0))
    assert card == pytest.approx(2 * omni, rel=0.05)
    assert back < 0.02 * omni
    mic_away = _energy(scene, None, dv.cardioid(0.0), (5.0, 0.0))
    assert mic_away < 0.02 * omni


def test_forced_accel_with_directivity_runs_on_chip():
    # Round 3: directivity runs in-kernel on every kernel family —
    # the accel paths included (parity in tests_tpu/test_directive_tpu.py;
    # this pins the engine routing on the real backend).
    scene = barrier_scene()
    # listener on the SOURCE side of the barrier (direct + echo visible)
    p = TraceParams.make(np.float32([-3.0, 0.0]), np.float32([-3.0, 1.5]),
                         directivity=dv.cardioid(0.0))
    st = trace_accumulate(scene, p, IRState.zeros(2048),
                          jax.random.PRNGKey(0), n_rays=4096,
                          max_bounces=3, sample_rate=SR, backend="accel")
    assert float(np.asarray(st.sum).sum()) > 0
