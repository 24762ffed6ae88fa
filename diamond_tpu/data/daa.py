"""DAA (DIAMOND Alignment Archive) format — reader, writer, view.

Byte-compatible with the reference (reference src/legacy/daa/daa_file.h:28-120,
daa_write.cpp:25-120, daa_record.cpp:53-110, basic/packed_transcript.h,
basic/packed_sequence.h).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from diamond_tpu.constants.alphabet import AMINO_ACID_ALPHABET

MAGIC = 0x3C0E53476D3EE36B
VERSION = 1

OP_MATCH, OP_INSERTION, OP_DELETION, OP_SUBSTITUTION = 0, 1, 2, 3

H2_STRUCT = "<QQQQQQ" + "iiiiiiii" + "dddd" + "16s" + "256Q" + "256s"
H2_SIZE = struct.calcsize(H2_STRUCT)


@dataclass
class DaaHeader:
    diamond_build: int = 182
    db_seqs: int = 0
    db_seqs_used: int = 0
    db_letters: int = 0
    flags: int = 0
    query_records: int = 0
    mode: int = 2  # blastp
    gap_open: int = 11
    gap_extend: int = 1
    k: float = 0.041
    lam: float = 0.267
    evalue: float = 0.001
    score_matrix: str = "blosum62"
    block_size: list = field(default_factory=lambda: [0] * 256)
    block_type: list = field(default_factory=lambda: [0] * 256)


def pack_sequence(letters: np.ndarray, bits: int = 5) -> bytes:
    out = bytearray()
    x = 0
    n = 0
    for l in np.asarray(letters).astype(np.uint8):
        x |= int(l) << n
        n += bits
        while n >= 8:
            out.append(x & 0xFF)
            n -= 8
            x >>= 8
    if n > 0:
        out.append(x & 0xFF)
    return bytes(out)


def unpack_sequence(data: bytes, length: int, bits: int = 5) -> np.ndarray:
    out = np.zeros(length, dtype=np.int8)
    x = 0
    n = 0
    pos = 0
    for i in range(length):
        while n < bits:
            x |= data[pos] << n
            pos += 1
            n += 8
        out[i] = x & ((1 << bits) - 1)
        x >>= bits
        n -= bits
    return out


def pack_transcript(transcript) -> bytes:
    """Our op list -> packed bytes (reference packed_transcript.h:160-185)."""
    out = bytearray()
    for op, val in transcript:
        if op == "M":
            n = val
            while n > 0:
                c = min(n, 63)
                if out and (out[-1] >> 6) == OP_MATCH and (out[-1] & 63) not in (0, 63) \
                        and False:
                    pass
                out.append((OP_MATCH << 6) | c)
                n -= c
        elif op == "S":
            out.append((OP_SUBSTITUTION << 6) | (val & 63))
        elif op == "I":
            n = val
            while n > 0:
                c = min(n, 63)
                out.append((OP_INSERTION << 6) | c)
                n -= c
        else:  # D: one letter per op
            out.append((OP_DELETION << 6) | (val & 63))
    out.append(0)  # terminator: op_match count 0
    return bytes(out)


def merge_match_ops(transcript):
    """Merge adjacent M runs like the reference push_back(op, count)."""
    merged = []
    for op, val in transcript:
        if op == "M" and merged and merged[-1][0] == "M":
            merged[-1] = ("M", merged[-1][1] + val)
        else:
            merged.append([op, val] if op == "M" else (op, val))
    return [(o, v) for o, v in merged]


def read_transcript(data: bytes, pos: int):
    """Packed bytes -> op list; returns (ops, new_pos)."""
    ops = []
    while True:
        code = data[pos]
        pos += 1
        op = code >> 6
        arg = code & 63
        if op == OP_MATCH and arg == 0:
            break
        if op == OP_MATCH:
            ops.append(("M", arg))
        elif op == OP_INSERTION:
            ops.append(("I", arg))
        elif op == OP_DELETION:
            ops.append(("D", arg))
        else:
            ops.append(("S", arg))
    return ops, pos


class DaaReader:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.data = f.read()
        magic, version = struct.unpack_from("<QQ", self.data, 0)
        if magic != MAGIC:
            raise ValueError("Input file is not a DAA file.")
        if version > VERSION:
            raise ValueError("DAA version requires later version of DIAMOND.")
        vals = struct.unpack_from(H2_STRUCT, self.data, 16)
        h = DaaHeader()
        (h.diamond_build, h.db_seqs, h.db_seqs_used, h.db_letters, h.flags,
         h.query_records) = vals[:6]
        (h.mode, h.gap_open, h.gap_extend, _, _, _, _, _) = vals[6:14]
        (h.k, h.lam, h.evalue, _) = vals[14:18]
        h.score_matrix = vals[18].split(b"\x00")[0].decode()
        h.block_size = list(vals[19 : 19 + 256])
        self.h = h
        self.records_start = 16 + H2_SIZE
        if h.block_size[0] == 0:
            raise ValueError("Invalid DAA file.")
        # ref names and lengths
        pos = self.records_start + h.block_size[0]
        self.ref_names = []
        for _ in range(h.db_seqs_used):
            end = self.data.index(b"\x00", pos)
            self.ref_names.append(self.data[pos:end].decode())
            pos = end + 1
        self.ref_lens = list(struct.unpack_from(f"<{h.db_seqs_used}I", self.data, pos))

    def queries(self):
        """Yield (query_name, query_letters, [(subject_id, flag, score,
        query_begin, subject_begin, ops), ...])."""
        pos = self.records_start
        end = self.records_start + self.h.block_size[0] - 4
        data = self.data
        while pos < end:
            (rec_len,) = struct.unpack_from("<I", data, pos)
            pos += 4
            rec_end = pos + rec_len
            (qlen,) = struct.unpack_from("<I", data, pos)
            pos += 4
            zero = data.index(b"\x00", pos)
            qname = data[pos:zero].decode()
            pos = zero + 1
            flags = data[pos]
            pos += 1
            nbytes = (qlen * 5 + 7) // 8 if self.h.mode == 2 else \
                (qlen * (3 if flags & 1 else 2) + 7) // 8
            qseq = unpack_sequence(data[pos : pos + nbytes], qlen,
                                   5 if self.h.mode == 2 else (3 if flags & 1 else 2))
            pos += nbytes
            matches = []
            while pos < rec_end:
                (sid,) = struct.unpack_from("<I", data, pos)
                pos += 4
                flag = data[pos]
                pos += 1
                score, pos = self._read_packed(flag & 3, pos)
                qbegin, pos = self._read_packed((flag >> 2) & 3, pos)
                sbegin, pos = self._read_packed((flag >> 4) & 3, pos)
                ops, pos = read_transcript(data, pos)
                matches.append((sid, flag, score, qbegin, sbegin, ops))
            yield qname, qseq, matches

    def _read_packed(self, width_flag: int, pos: int):
        if width_flag == 0:
            return self.data[pos], pos + 1
        if width_flag == 1:
            return struct.unpack_from("<H", self.data, pos)[0], pos + 2
        return struct.unpack_from("<I", self.data, pos)[0], pos + 4


def view_daa(path: str, matrix=None):
    """Render a DAA file as default tabular lines (the `view` command)."""
    from diamond_tpu.align.extend import Hsp
    from diamond_tpu.output.tabular import format_match_line
    from diamond_tpu.stats.score_matrix import ScoreMatrix

    r = DaaReader(path)
    if matrix is None:
        matrix = ScoreMatrix(r.h.score_matrix.upper(), r.h.gap_open,
                             r.h.gap_extend, db_letters=r.h.db_letters)
    lines = []
    for qname, qseq, matches in r.queries():
        for sid, flag, score, qbegin, sbegin, ops in matches:
            h = Hsp(score=score)
            qlen = len(qseq)
            # replay transcript for stats
            i, j = qbegin, sbegin
            ident = mism = pos_ = gapo = gaps = length = 0
            prev_gap = None
            for op, val in ops:
                if op == "M":
                    ident += val
                    length += val
                    i += val
                    j += val
                    prev_gap = None
                elif op == "S":
                    mism += 1
                    if matrix.matrix32[int(qseq[i]) & 31, val & 31] > 0:
                        pos_ += 1
                    length += 1
                    i += 1
                    j += 1
                    prev_gap = None
                elif op == "I":
                    gaps += val
                    length += val
                    if prev_gap != "I":
                        gapo += 1
                    i += val
                    prev_gap = "I"
                else:
                    gaps += 1
                    length += 1
                    if prev_gap != "D":
                        gapo += 1
                    j += 1
                    prev_gap = "D"
            h.identities = ident
            h.positives = ident + pos_
            h.mismatches = mism
            h.gap_openings = gapo
            h.gaps = gaps
            h.length = length
            h.query_range = (qbegin, i)
            h.subject_range = (sbegin, j)
            h.evalue = float(matrix.evalue(score, qlen, r.ref_lens[sid]))
            h.bit_score = float(matrix.bitscore(score))
            lines.append(format_match_line(qname, r.ref_names[sid].split()[0]
                                           if r.ref_names[sid] else "", h))
    return lines
