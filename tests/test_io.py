"""Round-trip and format tests for the io codecs."""

import numpy as np
import pytest

from tpu_sednn.io import (
    compute_norm,
    load_norm,
    load_wts,
    read_htk,
    read_pfile_frames,
    read_pfile_info,
    read_pfile_utterances,
    read_wav,
    save_norm,
    save_wts,
    write_htk,
    write_pfile,
    write_wav,
)
from tpu_sednn.io.htk import htk_le2be
from tpu_sednn.io.pfile import PFILE_HEADER_SIZE


def test_wts_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    sizes = [1548, 2048, 2048, 2048, 129]
    ws = [rng.standard_normal((sizes[i], sizes[i + 1])).astype(np.float32) * 0.01
          for i in range(len(sizes) - 1)]
    bs = [rng.standard_normal(sizes[i + 1]).astype(np.float32) for i in range(len(sizes) - 1)]
    p = tmp_path / "mlp.wts"
    save_wts(str(p), ws, bs)
    w2, b2 = load_wts(str(p), layersizes=sizes)
    for a, b in zip(ws, w2):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(bs, b2):
        np.testing.assert_array_equal(a, b)


def test_wts_binary_layout(tmp_path):
    """Byte layout must match Interface::Writeweights (Interface.cc:411-465)."""
    w = np.arange(6, dtype=np.float32).reshape(2, 3)  # prev=2, cur=3
    b = np.array([7.0, 8.0, 9.0], dtype=np.float32)
    p = tmp_path / "t.wts"
    save_wts(str(p), [w], [b])
    raw = p.read_bytes()
    stat = np.frombuffer(raw[:20], dtype="<i4")
    assert list(stat) == [10, 3, 2, 0, len("weights12") + 1]
    off = 20
    assert raw[off : off + 10] == b"weights12\0"
    off += 10
    data = np.frombuffer(raw[off : off + 24], dtype="<f4")
    # column-major (cur x prev): element [m + j*cur] = W[j, m]
    np.testing.assert_array_equal(data.reshape(2, 3), w)
    off += 24
    stat = np.frombuffer(raw[off : off + 20], dtype="<i4")
    assert list(stat) == [10, 1, 3, 0, len("bias2") + 1]
    off += 20
    assert raw[off : off + 6] == b"bias2\0"
    np.testing.assert_array_equal(np.frombuffer(raw[off + 6 : off + 18], dtype="<f4"), b)


def test_wts_shape_mismatch(tmp_path):
    w = np.zeros((4, 5), np.float32)
    b = np.zeros(5, np.float32)
    p = tmp_path / "t.wts"
    save_wts(str(p), [w], [b])
    with pytest.raises(ValueError):
        load_wts(str(p), layersizes=[4, 6])


def test_norm_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1000, 129)).astype(np.float32) * 3 + 1
    mean, inv_std = compute_norm(feats)
    p = tmp_path / "a.norm"
    save_norm(str(p), mean, inv_std)
    m2, v2 = load_norm(str(p), 129)
    np.testing.assert_allclose(mean, m2, rtol=1e-6)
    np.testing.assert_allclose(inv_std, v2, rtol=1e-6)
    normed = (feats - m2) * v2
    assert abs(normed.mean()) < 1e-2 and abs(normed.std() - 1.0) < 1e-2


def test_pfile_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    utts = [rng.standard_normal((n, 33)).astype(np.float32) for n in (17, 5, 120, 11)]
    p = tmp_path / "a.pfile"
    write_pfile(str(p), utts)
    info = read_pfile_info(str(p), 33)
    assert info.num_sentences == 4
    assert info.num_frames == 17 + 5 + 120 + 11
    np.testing.assert_array_equal(info.frames_before_sent, np.cumsum([17, 5, 120, 11]))
    back = read_pfile_utterances(str(p), 33)
    for a, b in zip(utts, back):
        np.testing.assert_array_equal(a, b)
    # random access
    np.testing.assert_array_equal(read_pfile_frames(str(p), 33, 17, 5), utts[1])


def test_pfile_frame_words_are_big_endian(tmp_path):
    utts = [np.ones((3, 4), np.float32)]
    p = tmp_path / "a.pfile"
    write_pfile(str(p), utts)
    raw = p.read_bytes()
    frame0 = raw[PFILE_HEADER_SIZE : PFILE_HEADER_SIZE + 4 * 6]
    ids = np.frombuffer(frame0[:8], dtype=">u4")
    assert list(ids) == [0, 0]  # sent 0, frame 0
    np.testing.assert_array_equal(np.frombuffer(frame0[8:], dtype=">f4"), np.ones(4))


def test_htk_roundtrip_and_le2be(tmp_path):
    rng = np.random.default_rng(3)
    fea = rng.standard_normal((40, 129)).astype(np.float32)
    le = tmp_path / "x.lsp"
    be = tmp_path / "x.lsp_be"
    write_htk(str(le), fea, big_endian=False)
    htk_le2be(str(le), str(be))
    f2, period, kind = read_htk(str(be), big_endian=True)
    np.testing.assert_array_equal(fea, f2)
    assert period == 160000 and kind == 9


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(str(p), x, sr)
    y, sr2 = read_wav(str(p))
    assert sr2 == sr
    np.testing.assert_allclose(x, y, atol=1.0 / 32768)


def test_read_reference_demo_wav():
    x, sr = read_wav("/root/reference/enh_wav_example/test1_org_noisy.wav")
    assert sr == 16000
    assert x.ndim == 1 and len(x) > sr  # at least a second of audio
    assert np.abs(x).max() <= 1.0


def test_save_wts_debug_txt(tmp_path):
    """The reference's Writeweights debug channel (weights.txt,
    Interface.cc:420,435-436): human-readable dump next to the binary.
    Documented divergence: the reference prints the bias POINTER by mistake;
    we print values."""
    import numpy as np

    from tpu_sednn.io.wts import load_wts, save_wts

    ws = [np.arange(6, dtype=np.float32).reshape(2, 3)]
    bs = [np.array([0.5, -1.0, 2.0], np.float32)]
    p = str(tmp_path / "m.wts")
    txt = str(tmp_path / "weights.txt")
    save_wts(p, ws, bs, debug_txt=txt)
    ws2, bs2 = load_wts(p)
    np.testing.assert_array_equal(ws2[0], ws[0])
    content = open(txt).read()
    assert "weights12" in content and "bias2" in content
    assert "0.500000" in content and "-1.000000" in content
