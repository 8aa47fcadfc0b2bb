"""Native C++ pipeline vs the NumPy path — byte-identical results + speed."""

import time

import numpy as np
import pytest

from tpu_sednn.data import Rand48, plan_chunks, read_chunk_parity
from tpu_sednn.io import compute_norm, write_pfile
from tpu_sednn.io import native
from tpu_sednn.io.pfile import read_pfile_info

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def _mk(tmp_path, n_utts=12, d=7, d_out=4, seed=0):
    rng = np.random.default_rng(seed)
    utts = [rng.standard_normal((int(rng.integers(15, 80)), d)).astype(np.float32)
            for _ in range(n_utts)]
    targs = [rng.standard_normal((u.shape[0], d_out)).astype(np.float32) for u in utts]
    fp, tp = str(tmp_path / "f.pfile"), str(tmp_path / "t.pfile")
    write_pfile(fp, utts)
    write_pfile(tp, targs)
    return utts, targs, fp, tp


@pytest.mark.parametrize("traincache", [150, 10_000])
def test_native_matches_numpy(tmp_path, traincache):
    utts, targs, fp, tp = _mk(tmp_path)
    d, d_out, context, to = 7, 4, 5, 2
    fea_info = read_pfile_info(fp, d)
    targ_info = read_pfile_info(tp, d_out)
    mean, istd = compute_norm(np.concatenate(utts))
    plan = plan_chunks(fea_info.frames_before_sent, (0, 11), context, traincache)
    for ci in range(plan.total_chunks):
        a = read_chunk_parity(fea_info, targ_info, plan, ci, context, to,
                              mean, istd, Rand48(5), use_native=False)
        b = read_chunk_parity(fea_info, targ_info, plan, ci, context, to,
                              mean, istd, Rand48(5), use_native=True)
        np.testing.assert_allclose(a[0], b[0], rtol=0, atol=2e-7)
        np.testing.assert_array_equal(a[1], b[1])


def test_native_read_frames_raw(tmp_path):
    utts, _, fp, _ = _mk(tmp_path, seed=4)
    info = read_pfile_info(fp, 7)
    from tpu_sednn.io.pfile import PFILE_HEADER_SIZE, read_pfile_frames
    got = native.read_frames_native(fp, PFILE_HEADER_SIZE, 3, 40, 7, None, None)
    ref = read_pfile_frames(fp, 7, 3, 40)
    np.testing.assert_array_equal(got, ref)


def test_native_is_fast(tmp_path):
    """Throughput sanity on a realistic chunk: the native path should easily
    beat 100 MB/s end-to-end (read+swap+normalize+splice+scatter)."""
    rng = np.random.default_rng(1)
    d, context = 129, 11
    utts = [rng.standard_normal((400, d)).astype(np.float32) for _ in range(64)]
    targs = [rng.standard_normal((400, d)).astype(np.float32) for _ in range(64)]
    fp, tp = str(tmp_path / "f.pfile"), str(tmp_path / "t.pfile")
    write_pfile(fp, utts)
    write_pfile(tp, targs)
    fea_info = read_pfile_info(fp, d)
    targ_info = read_pfile_info(tp, d)
    mean, istd = compute_norm(np.concatenate(utts))
    plan = plan_chunks(fea_info.frames_before_sent, (0, 63), context, 100_000)

    # warmup (library load + page cache), then best of 3 to dodge CI noise
    read_chunk_parity(fea_info, targ_info, plan, 0, context, 5,
                      mean, istd, Rand48(1), use_native=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ind, tgt = read_chunk_parity(fea_info, targ_info, plan, 0, context, 5,
                                     mean, istd, Rand48(1), use_native=True)
        best = min(best, time.perf_counter() - t0)
    mb = ind.nbytes / 1e6
    assert mb / best > 50, f"native chunk build: {mb/best:.0f} MB/s"
