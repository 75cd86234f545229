"""Interactive pose channel: steer a RUNNING stream from outside.

The reference is steered live — every frame it re-reads the scene
object transforms and the keyboard while audio plays
(``RayTraceManager.cs:50-61,67``: Update() reads ``source.position`` /
``listener.position``; FixedUpdate re-flattens moving colliders). The
framework's trajectories (``--move-source``, ``params_fn``,
``facing_fn``) are declared up front; this module adds the missing
*channel*: a JSON-lines feed (a file being appended to, or stdin) that
overrides the trajectory chunk by chunk while the stream runs — the
functional equivalent of dragging the Unity source around mid-play.

Feed protocol — one JSON object per line:

    {"chunk": 12, "source": [x, y]}
    {"chunk": 20, "listener": [x, y], "facing": 1.57}
    {"source": [x, y]}                  # no chunk: applies immediately

* ``chunk`` (optional int >= 0): the chunk index the override takes
  effect at; omitted = the next chunk polled. Lines may arrive in any
  order and any time; a line whose chunk has already played applies at
  the next poll (live feeds are late by nature).
* ``source`` / ``listener``: ``[x, y]`` (or ``[[x, y], ...]`` matching
  the param's source/listener count), world meters.
* ``facing`` (radians): the binaural head bearing.
* Overrides HOLD until a later line changes them (the Unity transform
  stays where you dragged it).

Every line is validated; a malformed line raises :class:`PoseFeedError`
naming the line — a steering channel that silently skips your input is
worse than one that stops.

Reads are non-blocking: each poll consumes whatever complete lines have
arrived (``select`` on pipes/stdin, plain read-to-EOF on regular files,
which is exactly "tail -f" semantics since the position persists across
polls). A trailing partial line is buffered until its newline arrives.
"""

from __future__ import annotations

import io
import json
import os
import select
import sys
from typing import Dict, Optional

import numpy as np


class PoseFeedError(ValueError):
    """A malformed pose-feed line (bad JSON, unknown key, bad shape)."""


_KEYS = {"chunk", "source", "listener", "facing"}


def _validate(obj, line_no: int, line: str) -> Dict:
    if not isinstance(obj, dict):
        raise PoseFeedError(
            f"pose feed line {line_no}: expected a JSON object, got "
            f"{type(obj).__name__}: {line!r}")
    unknown = set(obj) - _KEYS
    if unknown:
        raise PoseFeedError(
            f"pose feed line {line_no}: unknown key(s) {sorted(unknown)} "
            f"(valid: {sorted(_KEYS)}): {line!r}")
    out: Dict = {}
    if "chunk" in obj:
        c = obj["chunk"]
        if not isinstance(c, int) or isinstance(c, bool) or c < 0:
            raise PoseFeedError(
                f"pose feed line {line_no}: 'chunk' must be an int >= 0, "
                f"got {c!r}")
        out["chunk"] = c
    for key in ("source", "listener"):
        if key in obj:
            try:
                arr = np.asarray(obj[key], np.float32)
            except (TypeError, ValueError) as e:
                raise PoseFeedError(
                    f"pose feed line {line_no}: bad {key!r}: {e}") from None
            if arr.shape != (2,) and not (arr.ndim == 2
                                          and arr.shape[-1] == 2):
                raise PoseFeedError(
                    f"pose feed line {line_no}: {key!r} must be [x, y] or "
                    f"[[x, y], ...], got shape {arr.shape}")
            if not np.isfinite(arr).all():
                raise PoseFeedError(
                    f"pose feed line {line_no}: non-finite {key!r}: "
                    f"{obj[key]!r}")
            out[key] = arr
    if "facing" in obj:
        f = obj["facing"]
        if isinstance(f, bool) or not isinstance(f, (int, float)) \
                or not np.isfinite(f):
            raise PoseFeedError(
                f"pose feed line {line_no}: 'facing' must be a finite "
                f"number (radians), got {f!r}")
        out["facing"] = float(f)
    if not (set(out) - {"chunk"}):
        raise PoseFeedError(
            f"pose feed line {line_no}: no override present "
            f"(need source/listener/facing): {line!r}")
    return out


class PoseFeed:
    """Poll-driven JSON-lines pose overrides for a running stream.

    Wraps a base ``params_fn`` / ``facing_fn``: call :meth:`params` /
    :meth:`facing` in place of them (both pipelines call per chunk, in
    order). Each call polls the feed for newly arrived lines first.
    """

    def __init__(self, fh: io.TextIOBase, close: bool = False):
        self._fh = fh
        self._close = close
        self._buf = ""
        self._line_no = 0
        # (effective chunk, line number, override) in ingest order; the
        # state FOR a chunk is folded per query (see _state) instead of
        # held mutably, so polling ahead never leaks a later chunk's
        # override into an earlier chunk.
        self._events: list = []
        fd = None
        try:
            fd = fh.fileno()
        except (OSError, io.UnsupportedOperation, AttributeError):
            pass
        # Regular files read to EOF without blocking (tail semantics);
        # pipes/terminals need a readiness check per poll.
        self._select_fd = fd if fd is not None and not os.path.isfile(
            _fd_path(fd)) else None

    # -- construction --------------------------------------------------------

    @staticmethod
    def open(path: str) -> "PoseFeed":
        """``path`` or ``-`` for stdin."""
        if path == "-":
            return PoseFeed(sys.stdin, close=False)
        return PoseFeed(open(path, "r"), close=True)

    def close(self) -> None:
        if self._close:
            self._fh.close()

    # -- polling -------------------------------------------------------------

    def _read_available(self) -> str:
        if self._select_fd is not None:
            chunks = []
            while select.select([self._select_fd], [], [], 0)[0]:
                data = os.read(self._select_fd, 65536)
                if not data:
                    break
                chunks.append(data.decode("utf-8", errors="replace"))
            return "".join(chunks)
        return self._fh.read()

    def poll(self, chunk_index: int) -> None:
        """Consume every complete line that has arrived. Each line is
        recorded with its *effective* chunk — ``max(line's chunk,
        chunk_index)``: a future chunk waits for its chunk, a line with
        no chunk (or one whose chunk already played) takes effect now.
        Which overrides a given chunk sees is folded per query
        (:meth:`_state`), never held mutably — so the Doppler rate
        lookahead's ``params_fn(i + 1)`` call polling at ``i + 1``
        cannot leak a chunk-``i+1`` override into chunk ``i``'s trace
        (it also means a chunk-less line racing that lookahead lands at
        ``i + 1`` instead of ``i`` — live feeds are late by nature)."""
        self._buf += self._read_available()
        while "\n" in self._buf:
            line, self._buf = self._buf.split("\n", 1)
            self._line_no += 1
            if not line.strip():
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError as e:
                raise PoseFeedError(
                    f"pose feed line {self._line_no}: invalid JSON "
                    f"({e.msg}): {line!r}") from None
            o = _validate(obj, self._line_no, line)
            self._events.append(
                (max(o.get("chunk", chunk_index), chunk_index),
                 self._line_no, o))

    def _state(self, chunk_index: int):
        """Fold the overrides effective at ``chunk_index``: by effective
        chunk, then feed order — the line applied *latest* wins
        (hold-until-changed), exactly the mutable-hold semantics for
        in-order playback, but stable under out-of-order queries."""
        src = lis = fac = None
        for due, _seq, o in sorted(self._events,
                                   key=lambda e: (e[0], e[1])):
            if due <= chunk_index:
                src = o.get("source", src)
                lis = o.get("listener", lis)
                fac = o.get("facing", fac)
        return src, lis, fac

    # -- the params_fn / facing_fn replacements ------------------------------

    def params(self, base_params, chunk_index: int):
        """``base_params`` = the trajectory's ``params_fn(chunk_index)``
        output; returns it with any held overrides applied."""
        self.poll(chunk_index)
        src_ov, lis_ov, _ = self._state(chunk_index)
        p = base_params
        if src_ov is not None:
            src = np.asarray(p.source, np.float32)
            ov = np.asarray(src_ov, np.float32)
            if src.ndim == 1:
                # single-source stream: accept [x, y] or [[x, y]]
                if ov.ndim == 2 and ov.shape == (1, 2):
                    ov = ov[0]
            else:
                ov = ov.reshape(-1, 2)
                if ov.shape[0] == 1 and src.shape[0] > 1:
                    ov = np.broadcast_to(ov, src.shape)
            if ov.shape != src.shape:
                raise PoseFeedError(
                    f"pose feed: source override shape {ov.shape} does "
                    f"not match the stream's {src.shape}")
            p = p._replace(source=np.asarray(ov, np.float32))
        if lis_ov is not None:
            lis = np.asarray(p.listeners, np.float32)
            ov = lis_ov.reshape(-1, 2)
            if ov.shape[0] == 1 and lis.shape[0] > 1:
                ov = np.broadcast_to(ov, lis.shape)
            if ov.shape != lis.shape:
                raise PoseFeedError(
                    f"pose feed: listener override shape {ov.shape} does "
                    f"not match the stream's {lis.shape}")
            p = p._replace(listeners=np.asarray(ov, np.float32))
        return p

    def facing(self, base_facing: float, chunk_index: int) -> float:
        """Held facing override, else the trajectory's value. Polls
        (idempotent per arrived data, so params+facing in one chunk is
        fine in either order)."""
        self.poll(chunk_index)
        fac = self._state(chunk_index)[2]
        return fac if fac is not None else base_facing


def _fd_path(fd: int) -> str:
    """/proc path of an fd (for the regular-file check); falls back to a
    non-file sentinel when /proc is unavailable."""
    p = f"/proc/self/fd/{fd}"
    return p if os.path.exists(p) else ""
