"""Byte-exact codecs for the reference's on-disk formats.

The reference moves all data between layers via files (SURVEY.md §1):
quicknet pfiles (features/targets), quicknet `.wts` (weights = checkpoint),
text `.norm` (mean / inverse stddev), HTK feature files, and 16-bit wavs.
"""

from tpu_sednn.io.wts import load_wts, save_wts
from tpu_sednn.io.norm import load_norm, save_norm, compute_norm
from tpu_sednn.io.pfile import (
    PfileInfo,
    read_pfile_info,
    read_pfile_frames,
    read_pfile_utterances,
    write_pfile,
)
from tpu_sednn.io.htk import read_htk, write_htk
from tpu_sednn.io.wav import read_wav, write_wav
