"""wav -> LPS pfile builder — the one-command replacement for the reference's
offline chain (Wav2LogSpec.exe -> le2be -> rand_list -> GetLenScp -> 10x
feacat -> pfile_concat, /root/reference/how_to_get_pfile.txt).

    python -m tpu_sednn.tools.make_pfile out.pfile out.norm wav1 wav2 ...
        [--sr 8000] [--shuffle SEED] [--scp list.scp] [--normalize]

Features are computed with the on-device STFT (Pallas on TPU, XLA elsewhere);
the `.norm` (mean / inverse stddev) is emitted alongside, covering the
norm-computation tool the reference never shipped (SURVEY.md §3.5).

--normalize writes NORMALIZED frames ((lps - mean) * inv_std) into the pfile
instead of raw LPS.  Use it for the TARGET pfile: the trainer applies the
.norm only to input features (Interface.cc:745-746, reproduced by the chunk
reader), so target conditioning is the packer's job — raw LPS targets
(mean ~ -10, floor -27.6) diverge at the reference's learning rates.  Keep
the emitted .norm: the enhance CLI's --targ-norm denormalizes the model
output with it at decode time.
"""

from __future__ import annotations

import argparse
import sys
from typing import List

import numpy as np


def build_pfile(wavs: List[str], out_pfile: str, out_norm: str | None,
                sample_rate: int | None = None, shuffle_seed: int | None = None,
                normalize: bool = False) -> int:
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
    mean, inv_std = compute_norm(np.concatenate(feats))
    if normalize:
        feats = [(f - mean) * inv_std for f in feats]
    write_pfile(out_pfile, feats)
    if out_norm:
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
    ap.add_argument("--normalize", action="store_true",
                    help="write normalized frames (for TARGET pfiles; see "
                         "module docstring)")
    args = ap.parse_args(argv)
    wavs = list(args.wavs)
    if args.scp:
        wavs += [l.strip() for l in open(args.scp) if l.strip()]
    if not wavs:
        ap.error("no input wavs")
    n = build_pfile(wavs, args.out_pfile, args.out_norm, args.sr, args.shuffle,
                    normalize=args.normalize)
    print(f"wrote {args.out_pfile}: {len(wavs)} utterances, {n} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
