"""BLAST tabular (-f 6) output.

Default fields: qseqid sseqid pident length mismatch gapopen qstart qend
sstart send evalue bitscore (reference src/output/blast_tab_format.cpp).
"""
from __future__ import annotations

from diamond_tpu.output.format import format_double, print_e

DEFAULT_FIELDS = ["qseqid", "sseqid", "pident", "length", "mismatch", "gapopen",
                  "qstart", "qend", "sstart", "send", "evalue", "bitscore"]


def format_match_line(query_name: str, target_name: str, hsp, fields=None) -> str:
    fields = fields or DEFAULT_FIELDS
    out = []
    for f in fields:
        if f == "qseqid":
            out.append(query_name)
        elif f == "sseqid":
            out.append(target_name)
        elif f == "pident":
            out.append(format_double(hsp.identities * 100.0 / hsp.length))
        elif f == "length":
            out.append(str(hsp.length))
        elif f == "mismatch":
            out.append(str(hsp.mismatches))
        elif f == "gapopen":
            out.append(str(hsp.gap_openings))
        elif f == "gaps":
            out.append(str(hsp.gaps))
        elif f == "ppos":
            out.append(format_double(hsp.positives * 100.0 / hsp.length))
        elif f == "qstart":
            out.append(str(hsp.query_range[0] + 1))
        elif f == "qend":
            out.append(str(hsp.query_range[1]))
        elif f == "sstart":
            out.append(str(hsp.subject_range[0] + 1))
        elif f == "send":
            out.append(str(hsp.subject_range[1]))
        elif f == "evalue":
            out.append(print_e(hsp.evalue))
        elif f == "bitscore":
            out.append(format_double(hsp.bit_score))
        elif f == "score":
            out.append(str(hsp.score))
        else:
            raise ValueError(f"Unsupported output field: {f}")
    return "\t".join(out)


def format_results(results: dict, query_block, target_block, fields=None):
    """Yield output lines in query order (ReorderQueue semantics)."""
    for qid in range(len(query_block)):
        matches = results.get(qid)
        if not matches:
            continue
        qname = query_block.seq_id(qid)
        for m in matches:
            tname = target_block.seq_id(m.target_block_id)
            for hsp in m.hsp:
                yield format_match_line(qname, tname, hsp, fields)
