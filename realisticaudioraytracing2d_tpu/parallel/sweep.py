"""Room-dataset sweeps across a device mesh (BASELINE.json config #5).

IR dataset generation: a batch of procedurally generated rooms (a stacked
:class:`~..models.scene.Scene` pytree) is sharded over the ``"rooms"`` mesh
axis with ``shard_map``; each device vmaps the trace+scatter over its local
rooms; results are gathered back as a fully replicated (or host-fetched)
``[n_rooms, L, T, K]`` IR dataset. The reference has no batch mode at all —
its closest analogue is re-running the Unity scene per room (SURVEY.md
section 2.4).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.scene import Scene
from ..ops import ir as irm
from ..ops.trace import TraceParams, trace_hits_only


@partial(jax.jit, static_argnames=("n_rays", "max_bounces", "sample_rate",
                                   "ir_length", "n_frames", "backend"))
def sweep_rooms(scenes: Scene, sources: jax.Array, listeners: jax.Array,
                key: jax.Array, *, n_rays: int, max_bounces: int,
                sample_rate: int, ir_length: int, n_frames: int = 1,
                listener_radius: float = 0.5, speed_of_sound: float = 343.0,
                input_gain: float = 1.0, backend: str = "auto") -> jax.Array:
    """Sweep a whole room batch on one device: returns IRs
    ``[n_rooms, L, T, K]``. ``scenes`` is a stacked Scene (leading room
    axis), ``sources``/``listeners`` are ``[n_rooms, 2]`` (listeners may be
    ``[n_rooms, L, 2]``).

    ``backend="auto"`` scans rooms through the fused TPU mega kernel
    (room geometry is a traced value — one compile for the batch);
    off-TPU it vmaps the jnp path."""
    n_rooms = sources.shape[0]
    keys = jax.random.split(key, n_rooms)

    p0 = TraceParams.make(sources[0], listeners[0], listener_radius,
                          speed_of_sound, input_gain)
    from ..engine import _rooms_fused_eligible
    use_fused = (backend == "fused" or
                 (backend == "auto"
                  and _rooms_fused_eligible(_index_scene(scenes, 0), p0,
                                      ir_length)))
    if use_fused:
        # whole dataset in ONE kernel launch: rooms are the leading grid
        # axis of the mega kernel (replaces the round-1 serial scan that
        # paid one launch sequence per room)
        from ..ops.pallas.bounce_kernel import trace_rooms_ir_mega
        irs = trace_rooms_ir_mega(
            scenes, sources, listeners, key, n_rays=n_rays,
            max_bounces=max_bounces, sample_rate=sample_rate,
            ir_length=ir_length, n_frames=n_frames,
            listener_radius=listener_radius,
            speed_of_sound=speed_of_sound, input_gain=input_gain)
        return irs / n_frames

    def one_room(scene, src, lis, k):
        p = TraceParams.make(src, lis, listener_radius, speed_of_sound,
                             input_gain)
        state = irm.IRState.zeros(ir_length, p.listeners.shape[0],
                                  scene.n_bands)

        def body(st, i):
            hits = trace_hits_only(scene, p, jax.random.fold_in(k, i),
                                   n_rays=n_rays, max_bounces=max_bounces)
            return irm.accumulate(st, hits, sample_rate), None

        state, _ = jax.lax.scan(body, state,
                                jnp.arange(n_frames, dtype=jnp.int32))
        return state.normalized()

    return jax.vmap(one_room)(scenes, sources, listeners, keys)


def _index_scene(scenes: Scene, i: int) -> Scene:
    return jax.tree_util.tree_map(lambda x: x[i], scenes)


def sweep_rooms_sharded(scenes: Scene, sources: jax.Array,
                        listeners: jax.Array, key: jax.Array, mesh: Mesh, *,
                        n_rays: int, max_bounces: int, sample_rate: int,
                        ir_length: int, n_frames: int = 1,
                        axis: str = "rooms", **pose_kw) -> jax.Array:
    """Shard the room batch over ``mesh[axis]``; each device sweeps its
    shard, and the dataset is all-gathered (XLA inserts the collective from
    the output sharding). Room count must divide evenly."""
    n_rooms = sources.shape[0]
    n_dev = mesh.shape[axis]
    if n_rooms % n_dev != 0:
        raise ValueError(f"{n_rooms} rooms not divisible by {axis}={n_dev}")

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    scenes = jax.device_put(scenes, shard)
    sources = jax.device_put(sources, shard)
    listeners = jax.device_put(listeners, shard)

    fn = jax.jit(
        partial(sweep_rooms, n_rays=n_rays, max_bounces=max_bounces,
                sample_rate=sample_rate, ir_length=ir_length,
                n_frames=n_frames, **pose_kw),
        in_shardings=(shard, shard, shard, repl),
        out_shardings=shard)
    return fn(scenes, sources, listeners, key)
