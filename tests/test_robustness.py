"""Malformed-input robustness of the native (C++) planes.

The data plane (CSV parser, ewine extraction, mmap cache) consumes FILE
DATA and the serving listeners consume NETWORK bytes — both are untrusted.
Every test here feeds hostile input and asserts the plane either returns a
well-defined value (NaN fields, cache miss, closed connection) or raises a
python exception — never crashes, never reads out of bounds, and keeps
serving well-formed traffic afterwards.

The reference has no native planes at all (pandas + in-process calls);
these guards are part of the new-build runtime (SURVEY.md §5.8).
"""

import os
import socket
import struct

import numpy as np
import pytest

from iinsvae_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native lib not built (no g++?)"
)

L = 16


# ------------------------------------------------------------- csv ----


def test_csv_empty_and_header_only(tmp_path):
    empty = tmp_path / "empty.csv"
    empty.write_text("")
    got = native.read_csv(str(empty))
    assert got.shape == (0, 0)

    header = tmp_path / "header.csv"
    header.write_text("a,b,c\n")
    got = native.read_csv(str(header))
    assert got.shape == (0, 0)


def test_csv_garbage_fields_become_nan(tmp_path):
    f = tmp_path / "garbage.csv"
    f.write_text("a,b,c\n1.5,hello,2.5\nworld,3.5,!!\n")
    got = native.read_csv(str(f))
    assert got.shape == (2, 3)
    np.testing.assert_array_equal(np.isnan(got),
                                  [[False, True, False], [True, False, True]])
    np.testing.assert_allclose(got[0, [0, 2]], [1.5, 2.5])
    np.testing.assert_allclose(got[1, 1], 3.5)


def test_csv_ragged_rows_keep_rectangular_layout(tmp_path):
    # short rows pad with NaN; OVER-LONG rows are truncated — either way the
    # result stays a dense (rows, cols) block (an over-long row once
    # corrupted the row-major layout and made the wrapper read past the
    # buffer)
    f = tmp_path / "ragged.csv"
    f.write_text("h1,h2,h3\n1,2,3\n4,5\n6,7,8,9,10\n11,12,13\n")
    got = native.read_csv(str(f))
    assert got.shape == (4, 3)
    np.testing.assert_allclose(got[0], [1, 2, 3])
    np.testing.assert_allclose(got[1, :2], [4, 5])
    assert np.isnan(got[1, 2])
    np.testing.assert_allclose(got[2], [6, 7, 8])  # 9, 10 dropped
    np.testing.assert_allclose(got[3], [11, 12, 13])


def test_csv_binary_garbage_does_not_crash(tmp_path):
    f = tmp_path / "binary.csv"
    f.write_bytes(bytes(range(256)) * 64)
    got = native.read_csv(str(f), skip_header=False)
    assert got.ndim == 2  # shape is data-dependent; surviving is the test


# ----------------------------------------------------------- ewine ----


def _ewine_rows(fp_values, cols=220):
    rng = np.random.default_rng(0)
    n = len(fp_values)
    rows = rng.uniform(0.1, 5.0, (n, cols))
    rows[:, 4] = rng.uniform(1, 10, n)
    rows[:, 5] = rng.integers(0, 2, n)
    rows[:, 8] = fp_values
    rows[:, 17] = 1.5
    return rows


def test_ewine_hostile_fp_clamps_identically(tmp_path):
    """fp_idx comes from file data: negative, huge, NaN and fractional
    values must neither wrap nor read out of bounds, and the native plane
    must match the python twin exactly."""
    from iinsvae_tpu.data.ewine import extract_reg_arrays

    rows = _ewine_rows([-1e9, -5.0, 0.0, 30.0, 2.7, 1e9, np.nan])
    cir_n, err_n, lab_n = native.ewine_extract(rows)
    cir_p, err_p, lab_p = extract_reg_arrays(rows)
    assert np.isfinite(cir_n).all()
    np.testing.assert_allclose(cir_n, cir_p, rtol=1e-12)
    np.testing.assert_allclose(err_n, err_p, rtol=1e-12)
    np.testing.assert_allclose(lab_n, lab_p)


def test_ewine_narrow_rows_raise():
    from iinsvae_tpu.data.ewine import extract_reg_arrays

    rows = np.ones((3, 100))
    with pytest.raises(ValueError):
        native.ewine_extract(rows)
    with pytest.raises(ValueError):
        extract_reg_arrays(rows)


# ----------------------------------------------------------- cache ----

# header layout (iinsvae_io.cc): magic 8B, int64 n_arrays at 8, then 72-byte
# records {name[16], dtype i64, ndim i64, dims[4] i64, offset i64} at 16
_REC0 = 16
_REC_DTYPE = _REC0 + 16
_REC_NDIM = _REC0 + 24
_REC_DIMS = _REC0 + 32
_REC_OFFSET = _REC0 + 64


def _valid_cache(tmp_path, name="c.iinsc"):
    from iinsvae_tpu.runtime.cache import write_cache

    path = str(tmp_path / name)
    arrays = {
        "cir": np.arange(24, dtype=np.float32).reshape(4, 6),
        "label": np.arange(4, dtype=np.int64),
    }
    assert write_cache(path, arrays)
    return path, arrays


def _patched(path, offset, value_i64):
    with open(path, "r+b") as f:
        f.seek(offset)
        f.write(struct.pack("<q", value_i64))


@pytest.mark.parametrize(
    "offset,value",
    [
        (8, 2**40),        # n_arrays: record table would exceed the file
        (8, -1),           # n_arrays negative
        (_REC_DTYPE, 99),  # unknown dtype
        (_REC_NDIM, 7),    # ndim out of range
        (_REC_DIMS, 2**62),   # dims: elems * itemsize overflows
        (_REC_DIMS, -4),      # negative dim
        (_REC_OFFSET, 2**40),  # payload points past the file
        (_REC_OFFSET, -64),    # payload points before the header
    ],
)
def test_cache_corrupt_header_is_a_miss(tmp_path, offset, value):
    from iinsvae_tpu.runtime.cache import read_cache

    path, _ = _valid_cache(tmp_path)
    _patched(path, offset, value)
    assert read_cache(path) is None


def test_cache_truncated_payload_is_a_miss(tmp_path):
    from iinsvae_tpu.runtime.cache import read_cache

    path, _ = _valid_cache(tmp_path)
    size = os.path.getsize(path)
    with open(path, "r+b") as f:
        f.truncate(size - 40)
    assert read_cache(path) is None


def test_cache_magic_plus_garbage_is_a_miss(tmp_path):
    from iinsvae_tpu.runtime.cache import read_cache

    path = str(tmp_path / "junk.iinsc")
    with open(path, "wb") as f:
        f.write(b"IINSC01\0" + os.urandom(512))
    assert read_cache(path) is None


def test_cache_valid_file_still_reads(tmp_path):
    from iinsvae_tpu.runtime.cache import read_cache

    path, arrays = _valid_cache(tmp_path)
    got = read_cache(path)
    assert got is not None
    for k, v in arrays.items():
        np.testing.assert_array_equal(np.asarray(got[k]), v)


# ---------------------------------------------------- wire protocol ----


def _compute(cirs: np.ndarray):
    return cirs.mean(axis=1), np.round(cirs[:, 0]).astype(np.int64)


def _well_formed_roundtrip(sock_path):
    from iinsvae_tpu.runtime.batcher import socket_client_request

    cirs = np.full((2, L), 3.0)
    err, label = socket_client_request(sock_path, cirs, timeout_s=20.0)
    np.testing.assert_allclose(err, 3.0)
    assert (label == 3).all()


def _raw_send(sock_path, payload: bytes, expect_close: bool = True):
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.settimeout(10.0)
        s.connect(sock_path)
        s.sendall(payload)
        if expect_close:
            assert s.recv(1) == b"", "server should close on a bad header"


def test_server_rejects_malformed_headers(tmp_path):
    """Zero/negative/absurd row counts close the connection without
    wedging the server — and well-formed traffic keeps working after."""
    from iinsvae_tpu.runtime.batcher import BatchServer, SocketFront

    sock = str(tmp_path / "iins.sock")
    with BatchServer(_compute, cir_len=L, batch_size=8, deadline_ms=5.0) as srv:
        if not srv.native:
            pytest.skip("native plane unavailable")
        with SocketFront(srv, sock):
            for bad_n in (0, -5, 1 << 30, -(1 << 60)):
                _raw_send(sock, struct.pack("<q", bad_n))
                _well_formed_roundtrip(sock)


def test_server_survives_disconnect_mid_request(tmp_path):
    from iinsvae_tpu.runtime.batcher import BatchServer, SocketFront

    sock = str(tmp_path / "iins.sock")
    with BatchServer(_compute, cir_len=L, batch_size=8, deadline_ms=5.0) as srv:
        if not srv.native:
            pytest.skip("native plane unavailable")
        with SocketFront(srv, sock):
            # header promises 4 rows, deliver 1.5 rows, hang up
            row = np.full(L, 1.0).tobytes()
            with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
                s.connect(sock)
                s.sendall(struct.pack("<q", 4) + row + row[: len(row) // 2])
            # half a header, hang up
            with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
                s.connect(sock)
                s.sendall(b"\x02\x00\x00")
            _well_formed_roundtrip(sock)
            # the abandoned rows the server DID submit must not leak ring
            # slots forever: stats' reclaim/timeout counters account for
            # them eventually, but serving keeps working regardless
            _well_formed_roundtrip(sock)


def test_server_counts_rejected_frames_and_enforces_max_rows(tmp_path):
    """VERDICT round-4 weak 5: an enforced, configurable maximum request
    size — oversized headers are rejected, COUNTED (in-process property and
    wire stats op), and the server keeps serving."""
    from iinsvae_tpu.runtime.batcher import (
        BatchServer, SocketFront, socket_stats_request)

    sock = str(tmp_path / "iins.sock")
    with BatchServer(_compute, cir_len=L, batch_size=8, deadline_ms=5.0) as srv:
        if not srv.native:
            pytest.skip("native plane unavailable")
        with SocketFront(srv, sock, max_request_rows=4) as front:
            _raw_send(sock, struct.pack("<q", 5))       # over the cap
            _raw_send(sock, struct.pack("<q", 0))       # zero
            _raw_send(sock, struct.pack("<q", -(1 << 40)))  # garbage negative
            _well_formed_roundtrip(sock)                 # still serving
            assert front.rejected_frames == 3
            st = socket_stats_request(sock)
            assert st["rejected_frames"] == 3


def test_server_random_bytes_fuzz(tmp_path):
    """Random-bytes fuzz on BOTH fronts (unix + TCP): whatever garbage a
    client writes, the server must neither hang nor die — a well-formed
    request must succeed after every fuzz burst. Deterministic seed."""
    from iinsvae_tpu.runtime.batcher import (
        BatchServer, SocketFront, TcpFront, socket_client_request)

    rng = np.random.default_rng(1234)
    sock = str(tmp_path / "iins.sock")
    with BatchServer(_compute, cir_len=L, batch_size=8, deadline_ms=5.0) as srv:
        if not srv.native:
            pytest.skip("native plane unavailable")
        with SocketFront(srv, sock, recv_timeout_ms=500) as uf, \
             TcpFront(srv, 0, recv_timeout_ms=500) as tf:
            addrs = [sock, ("127.0.0.1", tf.port)]
            for trial in range(24):
                addr = addrs[trial % 2]
                family = socket.AF_UNIX if isinstance(addr, str) else socket.AF_INET
                payload = rng.bytes(int(rng.integers(1, 2048)))
                with socket.socket(family, socket.SOCK_STREAM) as s:
                    s.settimeout(10.0)
                    s.connect(addr)
                    s.sendall(payload)
                    # drain whatever comes back (a random header can be a
                    # small positive n — the server may answer NaN rows or
                    # close on the recv timeout; both are fine, hanging is
                    # not)
                    s.settimeout(3.0)
                    try:
                        while s.recv(4096):
                            pass
                    except (socket.timeout, ConnectionError):
                        pass
            # both planes still serve clean traffic afterwards
            _well_formed_roundtrip(sock)
            err, label = socket_client_request(
                ("127.0.0.1", tf.port), np.full((2, L), 4.0), timeout_s=20.0)
            np.testing.assert_allclose(err, 4.0)
            assert (label == 4).all()


def test_server_recv_timeout_frees_stalled_connection(tmp_path):
    """A peer that sends a header then stalls mid-frame is disconnected at
    the receive timeout instead of pinning a handler thread forever."""
    import time
    from iinsvae_tpu.runtime.batcher import BatchServer, SocketFront

    sock = str(tmp_path / "iins.sock")
    with BatchServer(_compute, cir_len=L, batch_size=8, deadline_ms=5.0) as srv:
        if not srv.native:
            pytest.skip("native plane unavailable")
        with SocketFront(srv, sock, recv_timeout_ms=300):
            with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
                s.settimeout(30.0)
                s.connect(sock)
                s.sendall(struct.pack("<q", 2))  # promise 2 rows, send none
                t0 = time.monotonic()
                # server must close us (recv -> b"") once the timeout fires
                assert s.recv(1) == b""
                assert time.monotonic() - t0 < 20.0
            _well_formed_roundtrip(sock)
