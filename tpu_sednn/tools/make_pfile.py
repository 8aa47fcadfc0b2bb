"""wav -> LPS pfile builder — the one-command replacement for the reference's
offline chain (Wav2LogSpec.exe -> le2be -> rand_list -> GetLenScp -> 10x
feacat -> pfile_concat, /root/reference/how_to_get_pfile.txt).

    python -m tpu_sednn.tools.make_pfile out.pfile out.norm wav1 wav2 ...
        [--sr 8000] [--shuffle SEED] [--scp list.scp]

Features are computed with the on-device STFT (Pallas on TPU, XLA elsewhere);
the `.norm` (mean / inverse stddev) is emitted alongside, covering the
norm-computation tool the reference never shipped (SURVEY.md §3.5).
"""

from __future__ import annotations

import argparse
import sys
from typing import List

import numpy as np


def build_pfile(wavs: List[str], out_pfile: str, out_norm: str | None,
                sample_rate: int | None = None, shuffle_seed: int | None = None) -> int:
    import jax.numpy as jnp

    from tpu_sednn.dsp import StftConfig
    from tpu_sednn.io import compute_norm, read_wav, save_norm, write_pfile
    from tpu_sednn.ops.stft_pallas import stft_lps_pallas

    if shuffle_seed is not None:
        # corpus-level randomization, the job of toolbox/rand_list.pl
        rng = np.random.default_rng(shuffle_seed)
        wavs = [wavs[i] for i in rng.permutation(len(wavs))]

    feats = []
    cfg = None
    for p in wavs:
        x, sr = read_wav(p)
        if sample_rate is not None and sr != sample_rate:
            from scipy.signal import resample_poly

            g = np.gcd(sr, sample_rate)
            x = resample_poly(x, sample_rate // g, sr // g).astype(np.float32)
            sr = sample_rate
        if cfg is None:
            cfg = StftConfig.for_rate(sr)
        feats.append(np.asarray(stft_lps_pallas(jnp.asarray(x), cfg)))
    write_pfile(out_pfile, feats)
    if out_norm:
        mean, inv_std = compute_norm(np.concatenate(feats))
        save_norm(out_norm, mean, inv_std)
    return sum(len(f) for f in feats)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_pfile")
    ap.add_argument("out_norm", nargs="?", default=None)
    ap.add_argument("wavs", nargs="*")
    ap.add_argument("--scp", help="file listing wav paths (one per line)")
    ap.add_argument("--sr", type=int, default=None, help="resample to this rate")
    ap.add_argument("--shuffle", type=int, default=None, metavar="SEED")
    args = ap.parse_args(argv)
    wavs = list(args.wavs)
    if args.scp:
        wavs += [l.strip() for l in open(args.scp) if l.strip()]
    if not wavs:
        ap.error("no input wavs")
    n = build_pfile(wavs, args.out_pfile, args.out_norm, args.sr, args.shuffle)
    print(f"wrote {args.out_pfile}: {len(wavs)} utterances, {n} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
