"""Multi-block (out-of-core) search: query blocks x reference blocks with a
k-way merged join.

TPU-native reshaping of the reference's block-swap driver (reference
src/run/double_indexed.cpp:697-749 master_thread, src/output/join_blocks.cpp
BlockJoiner): the reference pages blocks through RAM and joins per-block
intermediate files; here blocks page through device memory and the join is
an in-memory merge.  Semantics preserved: block boundaries cut after the
sequence that reaches the letter cap (reference sequence_file.cpp:202-240
load_twopass `letters < max_letters`), per-block extension runs the full
adaptive-ranking pipeline, and the join re-culls globally by (evalue,
score desc, target oid) (reference join_blocks.cpp:126-140 cmp_evalue).
"""
from __future__ import annotations

import numpy as np

from diamond_tpu.data.block import Block
from diamond_tpu.search.config import SearchConfig
from diamond_tpu.search.pipeline import Pipeline


def split_blocks(seqs, ids, max_letters: int):
    """Greedy letter-capped split (reference load_twopass boundary rule)."""
    blocks = []
    cur_s, cur_i, letters = [], [], 0
    base = 0
    bases = []
    for s, i in zip(seqs, ids):
        if letters >= max_letters and cur_s:
            blocks.append(Block.from_sequences(cur_s, cur_i))
            bases.append(base)
            base += len(cur_s)
            cur_s, cur_i, letters = [], [], 0
        cur_s.append(s)
        cur_i.append(i)
        letters += len(s)
    if cur_s:
        blocks.append(Block.from_sequences(cur_s, cur_i))
        bases.append(base)
    return blocks, bases


def blocked_search(cfg: SearchConfig, query_seqs, query_ids, target_seqs,
                   target_ids, block_size_gb: float):
    """Returns ({global_query_id: [(global_target_id, Match)]}, n_queries)."""
    cap = int(block_size_gb * 1e9)
    total_letters = sum(len(s) for s in target_seqs)
    cfg.matrix.set_db_letters(total_letters)

    t_blocks, t_bases = split_blocks(target_seqs, target_ids, cap)
    q_blocks, q_bases = split_blocks(query_seqs, query_ids, cap)

    merged: dict[int, list] = {}
    for qb, q_base in zip(q_blocks, q_bases):
        for tb, t_base in zip(t_blocks, t_bases):
            pipe = Pipeline(cfg, qb, tb)
            pipe.cfg.matrix.set_db_letters(total_letters)  # keep global stats
            res = pipe.search()
            for qid, matches in res.items():
                bucket = merged.setdefault(q_base + qid, [])
                for m in matches:
                    bucket.append((t_base + m.target_block_id, m))
    # global join culling (reference join_blocks.cpp join_query)
    out: dict[int, list] = {}
    for gqid, items in merged.items():
        if cfg.toppercent is not None:
            items.sort(key=lambda tm: (-tm[1].filter_score, tm[0]))
            if items:
                from diamond_tpu.align.extend import _top_cutoff_score

                cutoff = max(_top_cutoff_score(
                    float(cfg.matrix.bitscore(items[0][1].filter_score)),
                    cfg.toppercent), 1.0)
                items = [t for t in items
                         if float(cfg.matrix.bitscore(t[1].filter_score))
                         >= cutoff]
        else:
            items.sort(key=lambda tm: (tm[1].filter_evalue,
                                       -tm[1].filter_score, tm[0]))
            items = items[: cfg.max_target_seqs]
        out[gqid] = items
    return out
