"""Cross-validation against the image-source method.

An oracle independent of every line of the tracer: in a rectangular
room with PURELY SPECULAR walls (scattering 0, transmission 0), the
early reflections arrive exactly at the image-source delays
``|image(S) - L| / c``. The Monte-Carlo IR can only deposit a
first-order wall reflection at delay ``(|S->P| + |P->L|) / c`` for some
wall point ``P``, which is minimized AT the specular point — so each
first-order reflection is a distribution with a sharp ONSET at its
image-source delay. We assert:

* the direct arrival lands in exactly the predicted bin,
* no energy at all before the direct arrival,
* nothing between the direct arrival and the earliest first-order
  image delay (the tracer cannot beat geometry),
* energy present just after EVERY first-order image delay.
"""

import numpy as np
import pytest

import jax

from realisticaudioraytracing2d_tpu.engine import trace_accumulate
from realisticaudioraytracing2d_tpu.models.materials import AudioMaterial
from realisticaudioraytracing2d_tpu.models.rooms import shoebox_room
from realisticaudioraytracing2d_tpu.ops.ir import IRState
from realisticaudioraytracing2d_tpu.ops.trace import TraceParams

SR = 48000
C = 343.0
W, H = 8.0, 6.0
SRC = np.array([-2.0, 1.0])
LIS = np.array([2.5, -1.5])

SPECULAR = AudioMaterial(absorption=0.3, scattering=0.0, transmission=0.0,
                         ior=1.0)


def first_order_images():
    """Mirror the source across the 4 wall inner planes (x = +-W/2,
    y = +-H/2)."""
    imgs = []
    for axis, plane in ((0, W / 2), (0, -W / 2), (1, H / 2), (1, -H / 2)):
        m = SRC.copy()
        m[axis] = 2 * plane - m[axis]
        imgs.append(m)
    return imgs


@pytest.fixture(scope="module")
def traced_ir():
    scene = shoebox_room(W, H, wall_material=SPECULAR)
    # small listener so arrival-time smearing from the capture circle
    # stays under one bin of slack
    p = TraceParams.make(SRC, LIS, listener_radius=0.1, speed_of_sound=C)
    st = trace_accumulate(scene, p, IRState.zeros(SR // 4),
                          jax.random.PRNGKey(0), n_rays=200_000,
                          max_bounces=3, sample_rate=SR, n_frames=4)
    return np.asarray(st.sum)[0, :, 0]


def test_direct_arrival_bin_exact(traced_ir):
    d = np.linalg.norm(SRC - LIS)
    direct_bin = int(np.floor((d - 0.1) / C * SR))   # to the capture rim
    first = np.flatnonzero(traced_ir)[0]
    # direct capture spreads over the circle: first deposit within the
    # rim-to-center window
    center_bin = int(np.floor(d / C * SR))
    assert direct_bin <= first <= center_bin


def test_silence_before_first_image(traced_ir):
    # between the direct path (through the capture circle) and the
    # earliest first-order reflection there is exact geometric silence.
    # Reflected rays can be captured on the circle RIM, arriving up to
    # one radius (0.1 m) before the center-to-center image delay — the
    # window therefore ends at the rim-adjusted onset.
    d_direct = np.linalg.norm(SRC - LIS)
    d_first_img = min(np.linalg.norm(m - LIS)
                      for m in first_order_images())
    lo = int(np.ceil(d_direct / C * SR)) + 2          # past direct smear
    hi = int(np.floor((d_first_img - 0.1) / C * SR)) - 1
    assert hi > lo
    assert traced_ir[lo:hi].sum() == 0.0


def test_energy_at_every_first_order_image(traced_ir):
    for m in first_order_images():
        t = np.linalg.norm(m - LIS) / C
        onset = int(np.floor((np.linalg.norm(m - LIS) - 0.1) / C * SR))
        window = traced_ir[max(0, onset):onset + int(2e-3 * SR)]
        assert window.sum() > 0.0, f"no energy at image {m}"


def test_no_preonset_leak(traced_ir):
    # sort image delays; just before the SECOND-earliest image onset the
    # only contributions can be direct + earlier images — i.e. the bins
    # immediately before each onset (minus rim slack) hold nothing NEW.
    delays = sorted(np.linalg.norm(m - LIS) / C
                    for m in first_order_images())
    # a 1-bin guard before the earliest reflection must be empty even
    # after the rim allowance
    guard = int(np.floor((delays[0] * C - 0.1) / C * SR)) - 1
    d_direct = np.linalg.norm(SRC - LIS)
    assert guard > int(np.ceil(d_direct / C * SR)) + 2
    assert traced_ir[guard] == 0.0
