"""Signal-processing primitives for offline sample extraction.

Vectorised numpy counterparts of the reference's per-interval python loops
(reference: src/data_preprocess/MOD/extract_samples.py:66-171). Layout parity:
time samples are [c, i, s]; frequency samples interleave per-channel
real/imag as [c0_re, c0_im, c1_re, c1_im, ...] exactly like the on-device FFT
(focal_tpu.ops.fft).
"""

import numpy as np
from scipy import signal as sps


def resample(x, orig_freq, new_freq):
    """Polyphase resampling of [time, channel] data.

    The reference uses torchaudio's bandlimited-sinc Resample
    (extract_samples.py:107-126); scipy's resample_poly with a Kaiser window
    is the same family of filter (windowed sinc) and matches within ~1e-3 of
    full scale for integer ratios like the 16 kHz -> 8 kHz MOD path.
    """
    from math import gcd

    g = gcd(int(orig_freq), int(new_freq))
    up, down = int(new_freq) // g, int(orig_freq) // g
    return sps.resample_poly(x, up, down, axis=0, window=("kaiser", 14.769656459379492))


def split_with_overlap(x, overlap_ratio, interval_len=None, num_interval=None):
    """Split [time, c] into complete fixed-length windows with overlap
    (reference: extract_samples.py:66-90). Returns [n, interval_len, c]."""
    assert interval_len is not None or num_interval is not None
    if interval_len is None:
        interval_len = int(len(x) // (1 + (num_interval - 1) * (1 - overlap_ratio)))
    interval_len = int(interval_len)
    step = int((1 - overlap_ratio) * interval_len)
    starts = range(0, len(x) - interval_len + 1, step)
    return np.stack([x[s : s + interval_len] for s in starts])


def extract_time_freq(segment, interval_span, freq):
    """One segment [seg_len*freq, c] -> (time [c,i,s], freq [2c,i,s]).

    Vectorised version of extract_loc_mod_tensor
    (reference: extract_samples.py:129-171).
    """
    intervals = split_with_overlap(segment, 0.0, interval_len=int(interval_span * freq))
    # [i, s, c] -> [c, i, s]
    time = intervals.transpose(2, 0, 1).astype(np.float32)

    spec = np.fft.fft(intervals, axis=1)  # [i, s, c] complex
    c = spec.shape[2]
    interleaved = np.stack([spec.real, spec.imag], axis=3)  # [i, s, c, 2]
    freq_arr = interleaved.transpose(2, 3, 0, 1).reshape(2 * c, *time.shape[1:])
    return time, freq_arr.astype(np.float32)


def segment_recording(data, freq, segment_span, overlap_ratio=0.0):
    """[time, c] -> [n_segments, segment_span*freq, c]."""
    return split_with_overlap(data, overlap_ratio, interval_len=int(segment_span * freq))
