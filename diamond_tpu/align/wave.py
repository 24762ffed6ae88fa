"""Wave extension driver: cross-query batched DP on the accelerator.

The reference parallelizes extension with a thread pool over query
partitions (reference src/align/align.cpp:203-269).  On TPU the analog is
batching: this driver advances the extension coroutines of a whole wave of
queries in lockstep, pools every coroutine's score-only banded-DP jobs
into one device mega-batch per round (ops/swipe_device.DeviceDP), and
feeds the results back.  Traceback and adjusted-matrix jobs stay on the
host C++ path (the survivor set is tiny — SURVEY §7 traceback strategy).

Output is collected per query id, so ordering (and therefore the byte
output) is identical to the serial driver.
"""
from __future__ import annotations

import numpy as np

from diamond_tpu.align.extend import (DpRequest, _run_dp_jobs,
                                      extend_query_gen)
from diamond_tpu.ops.banded_swipe import banded_swipe_batch_np
from diamond_tpu.ops.swipe_device import DeviceDP, job_fits_device


def _execute_round(reqs: dict, mat, device: DeviceDP):
    """Execute one round of DpRequests; returns {qid: response}."""
    responses = {}
    dev_requests = []   # (query, bias, jobs) triples for the device
    dev_scatter = []    # (qid, [job indices])
    for qid, r in reqs.items():
        out = [None] * len(r.jobs)
        responses[qid] = out
        if not r.jobs:
            continue
        std = [k for k, (tid, *_rest) in enumerate(r.job_meta)
               if tid not in r.tgt_matrices]
        adj = [k for k in range(len(r.jobs)) if k not in set(std)]
        if r.traceback:
            # host, with trace masks (C++ batch); on a traceback tie error
            # the coroutine falls back to the per-job oracle
            try:
                res = _run_dp_jobs(r.q, r.bias, r.jobs, r.job_meta,
                                   r.tgt_matrices, mat, True)
            except RuntimeError:
                responses[qid] = None
                continue
            for k, v in enumerate(res):
                out[k] = v
            continue
        small = [k for k in std
                 if job_fits_device(len(r.jobs[k][0]), r.jobs[k][1],
                                    r.jobs[k][2])]
        small_set = set(small)
        large = [k for k in std if k not in small_set]
        if large:
            res = banded_swipe_batch_np(r.q, r.bias,
                                        [r.jobs[k] for k in large],
                                        mat.matrix32, mat.gap_open,
                                        mat.gap_extend, traceback=False)
            for k, v in zip(large, res):
                out[k] = v
        for k in adj:
            tm = r.tgt_matrices[r.job_meta[k][0]]
            res = banded_swipe_batch_np(r.q, None, [r.jobs[k]], tm,
                                        mat.gap_open, mat.gap_extend,
                                        traceback=False)
            out[k] = res[0]
        if small:
            dev_requests.append((r.q, r.bias, [r.jobs[k] for k in small]))
            dev_scatter.append((qid, small))
    if dev_requests:
        results = device.run_many(dev_requests)
        for (qid, idx), res in zip(dev_scatter, results):
            for k, v in zip(idx, res):
                responses[qid][k] = v
    return responses


def extend_wave(ctx, by_query, qids, device: DeviceDP | None = None):
    """Extend all queries with cross-query device batching.

    Returns {qid: [Match, ...]} — byte-identical to the serial
    extend_query loop (exact int32 device scores, same ordering)."""
    mat = ctx.cfg.matrix
    if device is None:
        device = DeviceDP(mat.matrix32, mat.gap_open, mat.gap_extend)
    gens = {}
    pending = {}
    results = {}

    def step(qid, send_val):
        try:
            req = gens[qid].send(send_val)
            pending[qid] = req
        except StopIteration as e:
            results[qid] = e.value

    for qid in qids:
        gens[qid] = extend_query_gen(qid, by_query[qid], ctx)
        step(qid, None)

    while pending:
        current, pending = pending, {}
        responses = _execute_round(current, mat, device)
        for qid in current:
            step(qid, responses[qid])

    return results
