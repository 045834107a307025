"""Native request-batching serving front (ROADMAP 8 build-out).

``BatchServer`` sits between concurrent per-request clients and ONE
compute worker driving the jitted forward (serving.py::Predictor): clients
submit single CIRs and block on their ticket; the worker pulls fixed-size
batches — full batches immediately, partial batches once the oldest
request is ``deadline_ms`` old — runs the compute function, and posts
per-ticket results. The queueing/wakeup plane is native C++
(runtime_native/iinsvae_batcher.cc, mutex + three condvars, caller-owned
buffers) with a pure-python fallback so the surface works without a
toolchain.

The reference has no serving path at all (SURVEY.md §5.8: single process,
single device, per-batch .cuda()); this is a new-build component.
"""

from __future__ import annotations

import ctypes
import threading
from typing import Callable, Optional, Tuple

import numpy as np

from iinsvae_tpu.runtime import native as _native

_i64 = ctypes.c_int64
_p_i64 = ctypes.POINTER(ctypes.c_int64)
_p_d = ctypes.POINTER(ctypes.c_double)


def _load_batcher():
    lib = _native._load()
    if lib is None:
        return None
    if not hasattr(lib, "_batcher_bound"):
        lib.iins_batcher_create.restype = ctypes.c_void_p
        lib.iins_batcher_create.argtypes = [
            _i64, _i64, _i64, _i64, ctypes.c_double]
        lib.iins_batcher_destroy.argtypes = [ctypes.c_void_p]
        lib.iins_batcher_submit.restype = _i64
        lib.iins_batcher_submit.argtypes = [ctypes.c_void_p, _p_d]
        lib.iins_batcher_next_batch.restype = _i64
        lib.iins_batcher_next_batch.argtypes = [
            ctypes.c_void_p, _p_d, _p_i64, ctypes.c_double]
        lib.iins_batcher_post.argtypes = [
            ctypes.c_void_p, _p_i64, _p_d, _p_i64, _p_d, _i64]
        lib.iins_batcher_wait.restype = ctypes.c_int
        lib.iins_batcher_wait.argtypes = [
            ctypes.c_void_p, _i64, _p_d, _p_i64, _p_d, ctypes.c_double]
        lib.iins_batcher_pending.restype = _i64
        lib.iins_batcher_pending.argtypes = [ctypes.c_void_p]
        lib.iins_batcher_stats.argtypes = [ctypes.c_void_p, _p_i64]
        lib.iins_batcher_n_extra.restype = _i64
        lib.iins_batcher_n_extra.argtypes = [ctypes.c_void_p]
        lib.iins_batcher_set_reclaim_grace_ms.argtypes = [
            ctypes.c_void_p, ctypes.c_double]
        lib._batcher_bound = True
    return lib


class _PyBatcher:
    """Fallback with the same contract (condition-variable slot table)."""

    def __init__(self, cir_len, batch_size, max_pending, deadline_ms):
        self.cir_len, self.batch_size = cir_len, batch_size
        self.deadline = deadline_ms / 1e3
        self.max_pending = max_pending
        self.cv = threading.Condition()
        self.pending = {}   # ticket -> cir
        self.done = {}      # ticket -> (err, label)
        self.next_ticket = 0
        self.oldest = None
        self.shutdown = False
        self.arrivals = {}  # ticket -> submit time (queue-latency stats)
        self.done_at = {}   # ticket -> post time (grace-period reclaim)
        self.abandoned = set()  # tickets whose wait() timed out
        # a kDone result may only be stolen after this grace: its owner may
        # merely not have been scheduled yet (same policy as the native
        # plane's kReclaimGraceMs — round-5 dropped-result fix)
        self.reclaim_grace_s = 60.0
        # same counter set/order as the native plane's iins_batcher_stats
        self.st = dict(submitted=0, batches=0, full_batches=0, rows=0,
                       posted=0, reclaimed=0, wait_timeouts=0, queue_ns=0)

    def submit(self, cir):
        import time
        with self.cv:
            while (len(self.pending) + len(self.done) >= self.max_pending
                   and not self.shutdown):
                now = time.monotonic()
                stale = [t for t in self.done
                         if now - self.done_at.get(t, now) > self.reclaim_grace_s]
                if stale:
                    # grace expired: the owner died between submit and
                    # wait — drop its result so the ring cannot deadlock.
                    # Younger results are NEVER stolen (their owner may
                    # just not have been scheduled yet).
                    t0 = min(stale)
                    self.done.pop(t0)
                    self.done_at.pop(t0, None)
                    self.st["reclaimed"] += 1
                    break
                self.cv.wait(1.0)
            if self.shutdown:
                return -1
            t = self.next_ticket
            self.next_ticket += 1
            self.pending[t] = np.array(cir, dtype=np.float64)
            self.arrivals[t] = time.monotonic()
            if self.oldest is None:
                self.oldest = self.arrivals[t]
            self.st["submitted"] += 1
            self.cv.notify_all()
            return t

    def next_batch(self, wait_s):
        import time
        with self.cv:
            overall = time.monotonic() + wait_s
            while not self.shutdown:
                if len(self.pending) >= self.batch_size:
                    break
                if self.pending:
                    until = min(self.oldest + self.deadline, overall)
                    if time.monotonic() >= until:
                        break
                    self.cv.wait(until - time.monotonic())
                else:
                    if time.monotonic() >= overall:
                        return [], np.zeros((0, self.cir_len))
                    self.cv.wait(overall - time.monotonic())
            if self.shutdown:
                return None, None
            ts = sorted(self.pending)[: self.batch_size]
            cirs = np.stack([self.pending.pop(t) for t in ts])
            now = time.monotonic()
            self.st["batches"] += 1
            self.st["full_batches"] += len(ts) == self.batch_size
            self.st["rows"] += len(ts)
            self.st["queue_ns"] += int(sum(
                (now - self.arrivals.pop(t)) * 1e9 for t in ts))
            self.oldest = now if self.pending else None
            return ts, cirs

    def post(self, tickets, err, label, extra=None):
        import time
        with self.cv:
            for i, (t, e, c) in enumerate(zip(tickets, err, label)):
                if t in self.abandoned:
                    # the owner's wait() already timed out — free the
                    # slot instead of parking an uncollectable result
                    self.abandoned.discard(t)
                    self.st["reclaimed"] += 1
                    continue
                if extra is None:
                    self.done[t] = (float(e), int(c))
                else:
                    self.done[t] = (float(e), int(c), np.array(extra[i]))
                self.done_at[t] = time.monotonic()
                self.st["posted"] += 1
            self.cv.notify_all()

    def wait(self, ticket, wait_s):
        import time
        with self.cv:
            until = time.monotonic() + wait_s
            while ticket not in self.done and not self.shutdown:
                left = until - time.monotonic()
                if left <= 0:
                    # mark abandoned so post() frees the slot instead of
                    # parking a result nobody will collect (the loop
                    # guard guarantees the result isn't already here)
                    self.abandoned.add(ticket)
                    self.st["wait_timeouts"] += 1
                    return None
                self.cv.wait(left)
            if self.shutdown:
                return None
            res = self.done.pop(ticket)
            self.done_at.pop(ticket, None)
            self.cv.notify_all()
            return res

    def stop(self):
        with self.cv:
            self.shutdown = True
            self.cv.notify_all()


def _derive_stats(buf) -> dict:
    """9-counter snapshot (iins_batcher_stats order) -> the stats dict."""
    raw = dict(submitted=int(buf[0]), batches=int(buf[1]),
               full_batches=int(buf[2]), rows_dispatched=int(buf[3]),
               rows_posted=int(buf[4]), reclaimed=int(buf[5]),
               wait_timeouts=int(buf[6]), pending=int(buf[8]))
    queue_ns = int(buf[7])
    raw["mean_occupancy"] = (
        raw["rows_dispatched"] / raw["batches"] if raw["batches"] else 0.0)
    raw["mean_queue_ms"] = (
        queue_ns / raw["rows_dispatched"] / 1e6
        if raw["rows_dispatched"] else 0.0)
    return raw


class BatchServer:
    """compute_fn: (B, cir_len) float64 -> (err (B,), label (B,)) — or,
    with ``n_extra > 0``, (err (B,), label (B,), extra (B, n_extra)) for a
    richer payload (env-class probabilities, reconstructed CIR, ...). The
    worker thread pulls batches from the native plane and posts results;
    ``submit`` is thread-safe and blocks until this request's result lands.
    Use as a context manager (``stop()`` joins the worker BEFORE the native
    handle is destroyed — outstanding waits must finish first).

    ``compute_fn`` may also be a LIST of functions — one worker thread per
    entry, all pulling from the same queue (the batcher's next_batch is
    safe for concurrent pullers). That is the data-parallel serving path:
    one device-pinned compute per chip; each XLA dispatch releases the
    GIL, so workers overlap on real hardware."""

    def __init__(self, compute_fn, cir_len: int,
                 batch_size: int = 64, max_pending: int = 1024,
                 deadline_ms: float = 5.0, prefer_native: bool = True,
                 n_extra: int = 0, reclaim_grace_s: float = 60.0):
        fns = (list(compute_fn) if isinstance(compute_fn, (list, tuple))
               else [compute_fn])
        assert fns, "need at least one compute_fn"
        self.compute_fn = fns[0]
        self._compute_fns = fns
        self.cir_len, self.batch_size = cir_len, batch_size
        self.n_extra = n_extra
        self._lib = _load_batcher() if prefer_native else None
        if self._lib is not None:
            self._h = ctypes.c_void_p(self._lib.iins_batcher_create(
                cir_len, n_extra, batch_size, max_pending,
                ctypes.c_double(deadline_ms)))
            if not self._h:
                raise ValueError("iins_batcher_create rejected the config")
            # grace before an uncollected result's slot may be stolen by a
            # submitter — a fresh result's owner may merely not have been
            # scheduled yet (round-5 dropped-result fix); timed-out waiters
            # free their slots explicitly, so this only covers clients
            # that die between submit and wait
            self._lib.iins_batcher_set_reclaim_grace_ms(
                self._h, ctypes.c_double(reclaim_grace_s * 1e3))
            self._py = None
        else:
            self._h = None
            self._py = _PyBatcher(cir_len, batch_size, max_pending, deadline_ms)
            self._py.reclaim_grace_s = reclaim_grace_s
        self._stop = threading.Event()
        self._workers = [
            threading.Thread(target=self._run, args=(fn,), daemon=True)
            for fn in self._compute_fns]
        for w in self._workers:
            w.start()

    @property
    def native(self) -> bool:
        return self._h is not None

    def _run(self, compute_fn):
        bs, L = self.batch_size, self.cir_len
        cir_buf = np.empty((bs, L), dtype=np.float64)
        tik_buf = np.empty(bs, dtype=np.int64)
        while not self._stop.is_set():
            if self._h is not None:
                n = self._lib.iins_batcher_next_batch(
                    self._h, cir_buf.ctypes.data_as(_p_d),
                    tik_buf.ctypes.data_as(_p_i64), ctypes.c_double(50.0))
                if n <= 0:
                    continue
                ts, cirs = tik_buf[:n].copy(), cir_buf[:n]
            else:
                ts, cirs = self._py.next_batch(0.05)
                if ts is None or not len(ts):
                    continue
                ts = np.asarray(ts, dtype=np.int64)
            try:
                out = compute_fn(cirs)
                err = np.ascontiguousarray(
                    np.asarray(out[0], np.float64).reshape(-1))
                label = np.ascontiguousarray(
                    np.asarray(out[1], np.int64).reshape(-1))
                extra = None
                if self.n_extra:
                    extra = np.ascontiguousarray(np.asarray(
                        out[2], np.float64).reshape(len(ts), self.n_extra))
            except Exception:  # noqa: BLE001 — a transient compute failure
                # (e.g. the TPU tunnel dropping mid-serve) must not kill the
                # worker thread: post honest failure rows (err=NaN,
                # label=-1) so waiting clients unblock NOW instead of
                # timing out, then keep serving subsequent batches
                import logging
                logging.getLogger("iinsvae.serving").exception(
                    "compute_fn failed for a %d-row batch; posting NaN "
                    "failure rows and continuing", len(ts))
                err = np.full(len(ts), np.nan)
                label = np.full(len(ts), -1, dtype=np.int64)
                extra = (np.full((len(ts), self.n_extra), np.nan)
                         if self.n_extra else None)
            if self._h is not None:
                self._lib.iins_batcher_post(
                    self._h, ts.ctypes.data_as(_p_i64),
                    err.ctypes.data_as(_p_d), label.ctypes.data_as(_p_i64),
                    extra.ctypes.data_as(_p_d) if extra is not None else None,
                    len(ts))
            else:
                self._py.post(ts, err, label, extra)

    def submit(self, cir: np.ndarray, timeout_s: float = 30.0):
        """One request: (err_est, env_label) — plus the (n_extra,) payload
        row as a third element when n_extra > 0 — or None on timeout.
        A compute_fn failure for this request's batch comes back as
        (NaN, -1): honest and immediate rather than a timeout."""
        cir = np.ascontiguousarray(cir, dtype=np.float64).reshape(-1)
        assert cir.shape[0] == self.cir_len, cir.shape
        if self._h is not None:
            t = self._lib.iins_batcher_submit(self._h, cir.ctypes.data_as(_p_d))
            if t < 0:
                return None
            err = ctypes.c_double(0.0)
            label = _i64(-1)
            extra = np.zeros(self.n_extra, dtype=np.float64)
            rc = self._lib.iins_batcher_wait(
                self._h, t, ctypes.byref(err), ctypes.byref(label),
                extra.ctypes.data_as(_p_d) if self.n_extra else None,
                ctypes.c_double(timeout_s * 1e3))
            if rc != 1:
                return None
            if self.n_extra:
                return (err.value, label.value, extra)
            return (err.value, label.value)
        t = self._py.submit(cir)
        if t < 0:
            return None
        return self._py.wait(t, timeout_s)

    def pending(self) -> int:
        if self._h is not None:
            return int(self._lib.iins_batcher_pending(self._h))
        with self._py.cv:
            return len(self._py.pending)

    def stats(self) -> dict:
        """One consistent snapshot of the serving counters, identical on
        both planes: submitted / batches / full_batches / rows_dispatched /
        rows_posted / reclaimed / wait_timeouts / pending, plus the derived
        mean_occupancy (rows per dispatched batch — how full batches run
        vs ``batch_size``) and mean_queue_ms (submit→dispatch latency)."""
        if self._h is not None:
            buf = np.zeros(9, dtype=np.int64)
            self._lib.iins_batcher_stats(self._h, buf.ctypes.data_as(_p_i64))
            return _derive_stats(buf)
        with self._py.cv:
            st = dict(self._py.st)
            pending = len(self._py.pending)
        return _derive_stats([st["submitted"], st["batches"],
                              st["full_batches"], st["rows"], st["posted"],
                              st["reclaimed"], st["wait_timeouts"],
                              st["queue_ns"], pending])

    def stop(self):
        self._stop.set()
        if self._py is not None:
            self._py.stop()
        # workers exit within one next_batch slice (50 ms) unless one is
        # INSIDE compute_fn — which can legitimately run minutes (first TPU
        # compile of the serving forward is 30 s - 3 min on this image).
        # Destroying the native handle under a live worker is a
        # use-after-free (post would touch freed memory), so wait it out;
        # if the compute is truly hung, leak the handle rather than crash.
        deadline = 600.0
        import time as _time
        t0 = _time.monotonic()
        for w in self._workers:
            w.join(timeout=max(0.0, deadline - (_time.monotonic() - t0)))
        if any(w.is_alive() for w in self._workers):
            import logging
            logging.getLogger("iinsvae.serving").error(
                "serving worker still inside compute_fn after 600 s; "
                "leaking the native batcher handle instead of freeing it "
                "under a live thread")
            self._h = None
            return
        if self._h is not None:
            h, self._h = self._h, None
            self._lib.iins_batcher_destroy(h)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()


def _bind_server(lib):
    if not hasattr(lib, "_server_bound"):
        lib.iins_server_start.restype = ctypes.c_void_p
        lib.iins_server_start.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, _i64]
        lib.iins_server_start_tcp.restype = ctypes.c_void_p
        lib.iins_server_start_tcp.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, _i64]
        lib.iins_server_port.restype = ctypes.c_int32
        lib.iins_server_port.argtypes = [ctypes.c_void_p]
        lib.iins_server_stop.argtypes = [ctypes.c_void_p]
        lib.iins_server_set_max_rows.argtypes = [ctypes.c_void_p, _i64]
        lib.iins_server_set_recv_timeout_ms.argtypes = [ctypes.c_void_p, _i64]
        lib.iins_server_rejected.restype = _i64
        lib.iins_server_rejected.argtypes = [ctypes.c_void_p]
        lib._server_bound = True
    return lib


def _configure_front(lib, h, max_request_rows, recv_timeout_ms):
    """Protocol bounds (runtime_native/iinsvae_server.cc): cap on rows per
    frame (default 1<<20; oversized/garbage headers are rejected, counted,
    and the connection closed) and a per-read receive timeout (default
    5 min; a peer stalling mid-frame is disconnected, not left pinning a
    handler thread)."""
    if max_request_rows is not None:
        lib.iins_server_set_max_rows(h, int(max_request_rows))
    if recv_timeout_ms is not None:
        lib.iins_server_set_recv_timeout_ms(h, int(recv_timeout_ms))


class SocketFront:
    """Unix-socket listener in front of a NATIVE BatchServer
    (runtime_native/iinsvae_server.cc): external clients connect to
    ``sock_path`` and speak the framed protocol ([int64 n][n x cir_len
    f64] -> n x [f64 err, int64 label, n_extra f64]); their rows share
    batches with in-process submits. Requires the native plane (no python
    fallback — the fallback serving path is BatchServer.submit
    in-process)."""

    def __init__(self, server: BatchServer, sock_path: str,
                 max_request_rows: int | None = None,
                 recv_timeout_ms: int | None = None):
        if not server.native:
            raise RuntimeError("SocketFront requires the native batcher plane")
        self._lib = _bind_server(server._lib)
        self.sock_path = sock_path
        self._h = ctypes.c_void_p(self._lib.iins_server_start(
            server._h, sock_path.encode(), server.cir_len))
        if not self._h:
            raise OSError(f"iins_server_start failed on {sock_path}")
        _configure_front(self._lib, self._h, max_request_rows, recv_timeout_ms)

    @property
    def rejected_frames(self) -> int:
        """Bad/oversized request headers rejected so far (also the 10th
        field of the wire stats op — socket_stats_request)."""
        return int(self._lib.iins_server_rejected(self._h))

    def stop(self):
        if self._h:
            h, self._h = self._h, None
            self._lib.iins_server_stop(h)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()


class TcpFront:
    """TCP listener with the SocketFront protocol (cross-host serving).
    port=0 binds an ephemeral port; read the bound one from ``.port``.
    Binds all interfaces — front with TLS termination for untrusted
    networks."""

    def __init__(self, server: BatchServer, port: int = 0,
                 max_request_rows: int | None = None,
                 recv_timeout_ms: int | None = None):
        if not server.native:
            raise RuntimeError("TcpFront requires the native batcher plane")
        self._lib = _bind_server(server._lib)
        self._h = ctypes.c_void_p(self._lib.iins_server_start_tcp(
            server._h, port, server.cir_len))
        if not self._h:
            raise OSError(f"iins_server_start_tcp failed on port {port}")
        self.port = int(self._lib.iins_server_port(self._h))
        _configure_front(self._lib, self._h, max_request_rows, recv_timeout_ms)

    @property
    def rejected_frames(self) -> int:
        return int(self._lib.iins_server_rejected(self._h))

    def stop(self):
        if self._h:
            h, self._h = self._h, None
            self._lib.iins_server_stop(h)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()


def socket_client_request(addr, cirs: np.ndarray, timeout_s: float = 60.0,
                          n_extra: int = 0):
    """Client half of the listener protocol: (n, L) CIRs ->
    (err (n,), label (n,)) — plus extra (n, n_extra) when the server was
    built with a richer payload. ``addr``: a unix-socket path (str) or a
    (host, port) tuple for a TcpFront. One connection per call. Rows the
    server could not compute (shutdown, compute failure, per-ticket
    timeout) come back as err=NaN, label=-1. Requests may be arbitrarily
    large — the server streams rows through its batcher ring."""
    import socket
    import struct

    cirs = np.ascontiguousarray(cirs, dtype=np.float64)
    n = cirs.shape[0]
    family = socket.AF_UNIX if isinstance(addr, str) else socket.AF_INET
    with socket.socket(family, socket.SOCK_STREAM) as s:
        s.settimeout(timeout_s)
        s.connect(addr)
        s.sendall(struct.pack("<q", n) + cirs.tobytes())
        want = n * (16 + 8 * n_extra)
        buf = b""
        while len(buf) < want:
            chunk = s.recv(want - len(buf))
            if not chunk:
                raise IOError("server closed mid-response")
            buf += chunk
    rec = np.frombuffer(buf, dtype=[("err", "<f8"), ("label", "<i8"),
                                    ("extra", "<f8", (n_extra,))])
    if n_extra:
        return rec["err"].copy(), rec["label"].copy(), rec["extra"].copy()
    return rec["err"].copy(), rec["label"].copy()


def socket_stats_request(addr, timeout_s: float = 10.0) -> dict:
    """Query a SocketFront/TcpFront server's counters over the wire
    (header n = -1, response = 9 batcher int64s + 1 server int64:
    rejected_frames). Same dict as ``BatchServer.stats()`` plus
    ``rejected_frames`` — lets external operators watch occupancy, queue
    latency, and protocol abuse without in-process access."""
    import socket
    import struct

    family = socket.AF_UNIX if isinstance(addr, str) else socket.AF_INET
    with socket.socket(family, socket.SOCK_STREAM) as s:
        s.settimeout(timeout_s)
        s.connect(addr)
        s.sendall(struct.pack("<q", -1))
        buf = b""
        while len(buf) < 10 * 8:
            chunk = s.recv(10 * 8 - len(buf))
            if not chunk:
                raise IOError("server closed mid-stats-response")
            buf += chunk
    raw = np.frombuffer(buf, dtype="<i8")
    out = _derive_stats(raw[:9])
    out["rejected_frames"] = int(raw[9])
    return out


def serve_predictor(predictor, with_probs: bool = False,
                    with_recon: bool = False, **kw) -> BatchServer:
    """BatchServer over a serving.Predictor: one jitted forward per pulled
    batch (padded to the predictor's compiled batch size). cir_len
    defaults to the predictor's model geometry.

    ``predictor`` may be a LIST of Predictors — typically one per chip,
    each built with ``device=`` pinned to a different jax.Device — giving
    one worker thread per predictor pulling from the shared queue:
    data-parallel serving over a slice.

    with_probs appends the env-class probabilities to every result;
    with_recon appends the reconstructed CIR (requires a Predictor built
    with return_recon=True). The result row is then
    (err, label, [probs…][recon…])."""

    predictors = (list(predictor) if isinstance(predictor, (list, tuple))
                  else [predictor])
    first = predictors[0]
    cir_len = kw.pop("cir_len", None)
    if cir_len is None:
        cir_len = int(first.model.cir_len)
    n_extra = 0
    if with_probs:
        n_extra += int(first.model.num_classes)
    if with_recon:
        if not all(p.return_recon for p in predictors):
            raise ValueError("with_recon needs Predictor(return_recon=True)")
        n_extra += cir_len

    def make_compute(p):
        def compute(cirs: np.ndarray):
            pred = p(cirs.astype(np.float32))
            err, label = pred.err_est.reshape(-1), pred.label.reshape(-1)
            if not n_extra:
                return err, label
            parts = []
            if with_probs:
                parts.append(pred.label_probs)
            if with_recon:
                parts.append(pred.recon)
            return err, label, np.concatenate(parts, axis=1)
        return compute

    return BatchServer([make_compute(p) for p in predictors],
                       cir_len=cir_len,
                       batch_size=kw.pop("batch_size", first.batch_size),
                       n_extra=n_extra, **kw)
