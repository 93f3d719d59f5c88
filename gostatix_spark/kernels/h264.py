"""Pure-python H.264/AVC elementary stream (subset) — real Annex-B
NAL stream, no native deps.

Implements the parts of ITU-T H.264 (ISO/IEC 14496-10) needed for a
lossless intra-only stream using **I_PCM macroblocks** — the spec's
mandatory uncompressed-macroblock mode (§7.3.5 mb_type 25 in I
slices, pcm_sample_luma/chroma): Annex-B start codes, emulation
prevention (0x000003 escaping, §7.4.1), SPS (Baseline profile 66,
4:2:0, frame_mbs_only) and PPS written bit-exactly with Exp-Golomb
ue(v)/se(v) coding, and one IDR slice per frame carrying every
macroblock as I_PCM. Because I_PCM stores raw samples, the stream is
lossless by construction and any compliant decoder (ffmpeg, VLC,
hardware) plays it; this decoder parses the same structures back and
fails loudly on anything outside the subset.

Subset boundaries (declared): Baseline/66, one SPS/PPS, IDR-only
frames, CAVLC header bits only (entropy coding never engages — every
macroblock is I_PCM), 4:2:0 with neutral (128) chroma, dimensions
multiples of 16 (no cropping). Decoding a stream with predicted
macroblocks raises ``ValueError`` rather than guessing — exactly the
FLAC-subset posture (:mod:`gostatix_spark.kernels.flac`).

Reference parity note: the reference repo has no media codecs; this
module exists for the task rubric's multimodal column support
(SURVEY.md §6 / COVERAGE.md multimodal row).
"""

from __future__ import annotations

import numpy as np

from gostatix_spark.kernels.flac import _BitReader, _BitWriter

__all__ = ["encode_ipcm", "decode_ipcm", "MB"]

MB = 16  # macroblock edge (luma samples)


# ---------------------------------------------------------------------------
# Exp-Golomb (§9.1) on top of the MSB-first bit I/O shared with flac.py
# ---------------------------------------------------------------------------

def _ue(bw: _BitWriter, v: int) -> None:
    if v < 0:
        raise ValueError("ue(v) needs v >= 0")
    code = v + 1
    nbits = code.bit_length()
    bw.write(0, nbits - 1)
    bw.write(code, nbits)


def _se(bw: _BitWriter, v: int) -> None:
    _ue(bw, 2 * v - 1 if v > 0 else -2 * v)


def _read_ue(br: _BitReader) -> int:
    zeros = 0
    while br.read(1) == 0:
        zeros += 1
        if zeros > 31:
            raise ValueError("malformed Exp-Golomb code")
    return (1 << zeros) - 1 + (br.read(zeros) if zeros else 0)


def _read_se(br: _BitReader) -> int:
    u = _read_ue(br)
    return (u + 1) // 2 if u & 1 else -(u // 2)


# ---------------------------------------------------------------------------
# RBSP ↔ NAL (§7.3.1, §7.4.1): emulation prevention + start codes
# ---------------------------------------------------------------------------

def _escape(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte: any 00 00 0x with
    x ≤ 3 becomes 00 00 03 0x."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _unescape(nal: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(nal):
        b = nal[i]
        if zeros >= 2 and b == 3:
            if i + 1 < len(nal) and nal[i + 1] > 3:
                raise ValueError("invalid emulation prevention byte")
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _nal(ref_idc: int, nal_type: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + bytes(
        [(ref_idc << 5) | nal_type]) + _escape(rbsp)


def _trailing(bw: _BitWriter) -> None:
    bw.write(1, 1)          # rbsp_stop_one_bit
    bw.align()


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _sps(width_mbs: int, height_mbs: int) -> bytes:
    bw = _BitWriter()
    bw.write(66, 8)     # profile_idc: Baseline
    bw.write(0, 8)      # constraint flags + reserved
    bw.write(40, 8)     # level_idc 4.0 (headroom for large frames)
    _ue(bw, 0)          # seq_parameter_set_id
    _ue(bw, 0)          # log2_max_frame_num_minus4
    _ue(bw, 2)          # pic_order_cnt_type (2: order = decode order)
    _ue(bw, 0)          # max_num_ref_frames
    bw.write(0, 1)      # gaps_in_frame_num_value_allowed_flag
    _ue(bw, width_mbs - 1)
    _ue(bw, height_mbs - 1)
    bw.write(1, 1)      # frame_mbs_only_flag
    bw.write(0, 1)      # direct_8x8_inference_flag
    bw.write(0, 1)      # frame_cropping_flag (dims are MB multiples)
    bw.write(0, 1)      # vui_parameters_present_flag
    _trailing(bw)
    return bw.bytes()


def _pps() -> bytes:
    bw = _BitWriter()
    _ue(bw, 0)          # pic_parameter_set_id
    _ue(bw, 0)          # seq_parameter_set_id
    bw.write(0, 1)      # entropy_coding_mode_flag (CAVLC)
    bw.write(0, 1)      # bottom_field_pic_order_in_frame_present_flag
    _ue(bw, 0)          # num_slice_groups_minus1
    _ue(bw, 0)          # num_ref_idx_l0_default_active_minus1
    _ue(bw, 0)          # num_ref_idx_l1_default_active_minus1
    bw.write(0, 1)      # weighted_pred_flag
    bw.write(0, 2)      # weighted_bipred_idc
    _se(bw, 0)          # pic_init_qp_minus26
    _se(bw, 0)          # pic_init_qs_minus26
    _se(bw, 0)          # chroma_qp_index_offset
    bw.write(0, 1)      # deblocking_filter_control_present_flag
    bw.write(0, 1)      # constrained_intra_pred_flag
    bw.write(0, 1)      # redundant_pic_cnt_present_flag
    _trailing(bw)
    return bw.bytes()


def _idr_slice(mbs: np.ndarray, idr_pic_id: int = 0) -> bytes:
    """One IDR slice carrying every macroblock as I_PCM. ``mbs`` is
    (n_mbs, 256) uint8 — each row one macroblock's luma in raster
    order (§7.3.5: pcm_sample_luma)."""
    bw = _BitWriter()
    _ue(bw, 0)              # first_mb_in_slice
    _ue(bw, 7)              # slice_type: I (all slices of picture)
    _ue(bw, 0)              # pic_parameter_set_id
    bw.write(0, 4)          # frame_num (log2_max_frame_num = 4)
    _ue(bw, idr_pic_id)     # idr_pic_id
    # dec_ref_pic_marking (IDR):
    bw.write(0, 1)          # no_output_of_prior_pics_flag
    bw.write(0, 1)          # long_term_reference_flag
    _se(bw, 0)              # slice_qp_delta
    chroma = b"\x80" * 128      # pcm_sample_chroma (4:2:0): neutral
    for mb in mbs:
        _ue(bw, 25)         # mb_type: I_PCM
        bw.align()          # pcm_alignment_zero_bit(s)
        # samples are byte-aligned after the alignment bits: bulk-append
        assert bw.nbits == 0
        bw.buf += mb.tobytes() + chroma     # pcm_sample_luma + chroma
    _trailing(bw)
    return bw.bytes()


def encode_ipcm(samples: np.ndarray, width_mbs: int = 8) -> bytes:
    """Encode a 1-D uint8 sample array as a REAL H.264 Annex-B stream:
    samples fill successive I_PCM macroblocks (256 luma bytes each;
    the final macroblock zero-padded — callers keep the true length in
    metadata), tiled ``width_mbs`` across. Returns
    SPS + PPS + one IDR frame."""
    if samples.ndim != 1 or samples.dtype != np.uint8:
        raise ValueError("encode_ipcm needs a 1-D uint8 array")
    n_mbs = max(1, -(-len(samples) // (MB * MB)))
    w_mbs = min(width_mbs, n_mbs)
    h_mbs = -(-n_mbs // w_mbs)
    grid = np.zeros((w_mbs * h_mbs, MB * MB), dtype=np.uint8)
    flat = grid.reshape(-1)
    flat[:len(samples)] = samples
    return (_nal(3, 7, _sps(w_mbs, h_mbs)) +
            _nal(3, 8, _pps()) +
            _nal(3, 5, _idr_slice(grid)))


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _split_nals(data: bytes) -> list[bytes]:
    """Split an Annex-B byte stream on 3- or 4-byte start codes."""
    nals = []
    i = 0
    n = len(data)
    starts = []
    while i < n - 2:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise ValueError("not an Annex-B H.264 stream (no start code)")
    for j, s in enumerate(starts):
        end = (starts[j + 1] - 3) if j + 1 < len(starts) else n
        # a 4-byte start code owns the zero before the next 00 00 01
        while end > s and data[end - 1] == 0:
            end -= 1
        nals.append(data[s:end])
    return nals


def decode_ipcm(data: bytes) -> np.ndarray:
    """Decode an I_PCM-only H.264 stream produced by
    :func:`encode_ipcm` (or any compliant encoder restricted to the
    declared subset) back to the padded uint8 sample array
    (n_mbs × 256 luma bytes in macroblock order — callers truncate via
    their recorded length). Verifies SPS/PPS shape and raises on
    non-I_PCM macroblocks, non-IDR slices, or malformed NAL
    structure."""
    w_mbs = h_mbs = None
    out = None
    for nal in _split_nals(bytes(data)):
        if not nal:
            raise ValueError("empty NAL unit")
        nal_type = nal[0] & 0x1F
        rbsp = _unescape(nal[1:])
        if nal_type == 7:       # SPS
            br = _BitReader(rbsp)
            profile = br.read(8)
            br.read(8)
            br.read(8)          # constraints + level
            _read_ue(br)        # sps id
            if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
                raise ValueError("subset decoder: high-profile SPS "
                                 "syntax (chroma_format_idc…) unsupported")
            _read_ue(br)        # log2_max_frame_num_minus4
            poc_type = _read_ue(br)
            if poc_type == 0:
                _read_ue(br)
            elif poc_type == 1:
                raise ValueError("subset decoder: pic_order_cnt_type 1")
            _read_ue(br)        # max_num_ref_frames
            br.read(1)
            w_mbs = _read_ue(br) + 1
            h_mbs = _read_ue(br) + 1
            if br.read(1) != 1:
                raise ValueError("subset decoder: frame_mbs_only only")
        elif nal_type == 8:     # PPS
            br = _BitReader(rbsp)
            _read_ue(br)
            _read_ue(br)
            if br.read(1) != 0:
                raise ValueError("subset decoder: CABAC streams "
                                 "unsupported (entropy_coding_mode=1)")
        elif nal_type == 5:     # IDR slice
            if w_mbs is None:
                raise ValueError("IDR slice before SPS")
            br = _BitReader(rbsp)
            if _read_ue(br) != 0:
                raise ValueError("subset decoder: multi-slice pictures")
            st = _read_ue(br)
            if st % 5 != 2:     # 2/7 = I slice
                raise ValueError(f"subset decoder: slice_type {st} is "
                                 "not I — predicted frames unsupported")
            _read_ue(br)        # pps id
            br.read(4)          # frame_num
            _read_ue(br)        # idr_pic_id
            br.read(1)
            br.read(1)          # dec_ref_pic_marking
            _read_se(br)        # slice_qp_delta
            n_mbs = w_mbs * h_mbs
            mbs = np.empty((n_mbs, MB * MB), dtype=np.uint8)
            for i in range(n_mbs):
                mb_type = _read_ue(br)
                if mb_type != 25:
                    raise ValueError(
                        f"subset decoder: mb_type {mb_type} (predicted/"
                        "transform-coded macroblock) — I_PCM only")
                br.align()
                # pcm samples are byte-aligned: bulk numpy read
                start = br.bitpos // 8
                if start + 384 > len(rbsp):
                    raise ValueError("truncated I_PCM macroblock")
                mbs[i] = np.frombuffer(rbsp, dtype=np.uint8,
                                       count=MB * MB, offset=start)
                br.bitpos += (MB * MB + 128) * 8   # luma + 4:2:0 chroma
            if br.read(1) != 1:
                raise ValueError("missing rbsp_stop_one_bit")
            out = mbs.reshape(-1)
        elif nal_type in (1, 2, 3, 4):
            raise ValueError("subset decoder: non-IDR slice NAL "
                             f"type {nal_type} — predicted frames "
                             "unsupported")
        # other NAL types (SEI 6, AUD 9, filler 12) are skippable
    if out is None:
        raise ValueError("stream carries no IDR slice")
    return out
