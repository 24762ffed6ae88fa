"""Greedy diagonal-graph chaining — faithful port of the reference
Chaining::Aligner (reference src/chaining/greedy_align.cpp,
backtrace.cpp, diag_graph.h).

Diagonal segments become graph nodes; gap edges between nodes carry
link scores computed from the actual letters (get_hgap_link /
get_vgap_link, greedy_align.cpp:150-215), a windowed forward pass adds
approximate links (greedy_align.cpp:221-360), and the backtrace walks
best prefix scores into ApproxHsps whose d_min/d_max drive the banded-DP
band geometry (backtrace.cpp:70-360).  Defaults mirror the reference
config: SPACE_PENALTY 0.1, cutoff 19, max_shift = chaining-maxgap 2000,
chaining-range-cover 8, chaining-stacked-hsp-ratio 0.5.

The previous pairwise merge approximation missed chains that cross
distant diagonals (narrowing the DP band); this port reproduces the
reference band selection exactly.
"""
from __future__ import annotations

from bisect import bisect_left, insort

from diamond_tpu.align.chain import ApproxHsp, DiagSegment

SPACE_PENALTY = 0.1
LINK_PADDING = 10
REVERSE_LINK_MIN_OVERHANG = 10
RANGE_COVER = 8
STACKED_HSP_RATIO = 0.5
INT_MIN = -(2 ** 62)
INT_MAX = 2 ** 62


class _Node:
    __slots__ = ("i", "j", "len", "score", "link_idx", "prefix_score",
                 "path_max", "path_min")

    def __init__(self, seg: DiagSegment):
        self.i = seg.i
        self.j = seg.j
        self.len = seg.len
        self.score = seg.score
        self.link_idx = -1
        self.prefix_score = seg.score
        self.path_max = seg.score
        self.path_min = seg.score

    @property
    def diag(self):
        return self.i - self.j

    @property
    def query_end(self):
        return self.i + self.len

    @property
    def subject_end(self):
        return self.j + self.len

    @property
    def subject_last(self):
        return self.j + self.len - 1

    def rel_score(self):
        return (self.prefix_score if self.prefix_score == self.path_max
                else self.prefix_score - self.path_min)


class _Edge:
    __slots__ = ("prefix_score", "path_max", "j", "path_min",
                 "prefix_score_begin", "node_in", "node_out")

    def __init__(self, prefix_score, path_max, j, node_in, node_out,
                 path_min, prefix_score_begin):
        self.prefix_score = prefix_score
        self.path_max = path_max
        self.j = j
        self.path_min = path_min
        self.prefix_score_begin = prefix_score_begin
        self.node_in = node_in
        self.node_out = node_out


class _Link:
    __slots__ = ("subject_pos1", "query_pos1", "subject_pos2", "query_pos2",
                 "score1", "score2")

    def __init__(self):
        self.subject_pos1 = -1
        self.query_pos1 = 0
        self.subject_pos2 = 0
        self.query_pos2 = 0
        self.score1 = 0
        self.score2 = 0

    def transpose(self):
        self.subject_pos1, self.query_pos1 = self.query_pos1, self.subject_pos1
        self.subject_pos2, self.query_pos2 = self.query_pos2, self.subject_pos2

    def reset(self):
        self.subject_pos1 = -1
        self.score1 = 0
        self.score2 = 0


def _score_range(matrix32, query, subject, i, j, j_end):
    s = 0
    while j < j_end:
        s += int(matrix32[int(query[i]) & 31, int(subject[j]) & 31])
        i += 1
        j += 1
    return s


class _Seg:
    """Minimal (i, j, len, score) view used by the link routines (a
    DiagonalSegment that can be transposed)."""

    __slots__ = ("i", "j", "len", "score")

    def __init__(self, i, j, ln, score):
        self.i = i
        self.j = j
        self.len = ln
        self.score = score

    @property
    def diag(self):
        return self.i - self.j

    @property
    def query_end(self):
        return self.i + self.len

    @property
    def subject_end(self):
        return self.j + self.len

    @property
    def subject_last(self):
        return self.j + self.len - 1

    def transpose(self):
        return _Seg(self.j, self.i, self.len, self.score)


def _get_hgap_link(d1, d2, query, subject, link, padding, matrix32):
    """reference greedy_align.cpp:150-200."""
    d = d1.diag - d2.diag
    j2_end = min(max(d2.j, d1.subject_last + d + 1 + padding),
                 d2.subject_last)
    if d1.subject_last < d2.j - d - 1:
        j1 = d1.subject_last
        space = True
    else:
        j1 = max(d2.j - d - 1 - padding, d1.j)
        space = False
    j2 = j1 + d + 1
    i1 = d1.i + (j1 - d1.j)
    i2 = i1 + 1
    if j2 > d2.subject_last:
        link.reset()
        return INT_MIN
    score1 = 0
    score2 = (_score_range(matrix32, query, subject, i2, j2, d2.j) + d2.score
              - _score_range(matrix32, query, subject, d2.i, d2.j, j2))
    max_score = INT_MIN
    while True:
        if score1 + score2 > max_score:
            max_score = score1 + score2
            link.query_pos1 = i1
            link.subject_pos1 = j1
            link.query_pos2 = i2
            link.subject_pos2 = j2
            link.score1 = score1
            link.score2 = score2
        score2 -= int(matrix32[int(query[i2]) & 31, int(subject[j2]) & 31])
        i1 += 1
        i2 += 1
        j1 += 1
        j2 += 1
        if j2 > j2_end:
            break
        score1 += int(matrix32[int(query[i1]) & 31, int(subject[j1]) & 31])
    j1_end = j2_end - d
    if space:
        link.score1 += d1.score
    else:
        link.score1 += (d1.score
                        - _score_range(matrix32, query, subject,
                                       d1.diag + j1_end, j1_end,
                                       d1.subject_end)
                        + _score_range(matrix32, query, subject,
                                       d1.query_end, d1.subject_end, j1_end)
                        - score1)
    return max_score


def _get_link(d1, d2, query, subject, link, padding, matrix32):
    if d1.diag < d2.diag:
        s = _get_hgap_link(d1.transpose(), d2.transpose(), subject, query,
                           link, padding, matrix32)
        link.transpose()
        return s
    return _get_hgap_link(d1, d2, query, subject, link, padding, matrix32)


class Graph:
    """DiagGraph (reference diag_graph.h)."""

    def __init__(self):
        self.nodes: list[_Node] = []
        self.edges: list[_Edge] = []

    def load(self, segments):
        """Segments sorted by (diag, j); one node per diagonal run start
        (reference greedy_align.cpp:56-70)."""
        d = INT_MIN
        max_j_end = INT_MIN
        for s in segments:
            d2 = s.diag
            if d2 != d:
                d = d2
                self.nodes.append(_Node(s))
                max_j_end = self.nodes[-1].subject_end
            elif max_j_end < s.j:
                self.nodes.append(_Node(s))
                max_j_end = max(max_j_end, self.nodes[-1].subject_end)

    def sort(self):
        self.nodes.sort(key=lambda n: (n.j, n.i))

    def prune(self):
        """reference greedy_align.cpp:100-122 (chaining-range-cover 8)."""
        finished = []
        window = []
        for d in self.nodes:
            n = 0
            w2 = []
            for e in window:
                if e.subject_end > d.j:
                    if (e.score >= d.score and e.j <= d.j
                            and e.subject_end >= d.subject_end):
                        n += 1
                    w2.append(e)
                else:
                    finished.append(e)
            window = w2
            if n <= RANGE_COVER:
                window.append(d)
        finished.extend(window)
        self.nodes = finished

    def init_node(self, node):
        self.nodes[node].link_idx = len(self.edges)

    def add_edge(self, edge: _Edge):
        """reference diag_graph.h:133-148."""
        for j in range(edge.node_in + 1, len(self.nodes)):
            if self.nodes[j].link_idx == -1:
                break
            self.nodes[j].link_idx += 1
        d = self.nodes[edge.node_in]
        if edge.prefix_score > d.prefix_score:
            d.prefix_score = edge.prefix_score
            d.path_max = edge.path_max
            d.path_min = edge.path_min
        self.edges.insert(d.link_idx, edge)
        d.link_idx += 1

    def get_edge(self, node, j):
        """Best edge of `node` ending before subject pos j; None if the
        node's own score wins (reference diag_graph.h:150-171)."""
        d = self.nodes[node]
        if d.score == 0:
            return self.edges[d.link_idx - 1]
        if not self.edges:
            return None
        max_score = d.score
        max_i = -1
        i = d.link_idx - 1
        while i >= 0 and self.edges[i].node_in == node:
            if self.edges[i].j < j and self.edges[i].prefix_score > max_score:
                max_i = i
                max_score = self.edges[i].prefix_score
            i -= 1
        return self.edges[max_i] if max_i >= 0 else None

    def prefix_score(self, node, j):
        """(prefix_score, path_max, path_min) at subject pos j
        (reference diag_graph.h:173-179)."""
        e = self.get_edge(node, j)
        n = self.nodes[node]
        if e is None:
            return n.score, n.score, n.score
        return (max(n.score, e.prefix_score), max(n.score, e.path_max),
                e.path_min)


class Aligner:
    def __init__(self, query, subject, matrix32, gap_open, gap_extend,
                 query_len=None, subject_len=None):
        """query/subject: padded letter views; gap_open EXCLUDES the first
        extension (reference score_matrix.gap_open()).  query_len/
        subject_len: true sequence lengths (the views are padded)."""
        self.query = query
        self.subject = subject
        self.matrix32 = matrix32
        self.gap_open = gap_open
        self.gap_extend = gap_extend
        self.query_len = len(query) if query_len is None else query_len
        self.subject_len = (len(subject) if subject_len is None
                            else subject_len)
        self.diags = Graph()

    # -- forward pass ----------------------------------------------------
    def get_approximate_link(self, d_idx, e_idx, space_penalty):
        """reference greedy_align.cpp:221-275."""
        diags = self.diags
        d = diags.nodes[d_idx]
        e = diags.nodes[e_idx]
        shift = d.diag - e.diag
        gap_score = (-self.gap_open - abs(shift) * self.gap_extend
                     if shift != 0 else 0)
        space = d.j - e.subject_end if shift > 0 else d.i - e.query_end
        prefix_score = 0
        path_max = path_min = prefix_score_begin = 0
        link_j = 0
        if space <= 0 or space_penalty == 0.0:
            edge = diags.get_edge(d_idx, d.j)
            if (edge is not None
                    and edge.prefix_score > e.prefix_score + gap_score
                    + d.score):
                return 0
            link = _Link()
            if _get_link(_Seg(e.i, e.j, e.len, e.score),
                         _Seg(d.i, d.j, d.len, d.score), self.query,
                         self.subject, link, LINK_PADDING,
                         self.matrix32) > 0:
                diff1 = e.score - link.score1
                prefix_e, path_max, path_min = diags.prefix_score(
                    e_idx, link.subject_pos1)
                prefix_score = prefix_e - diff1 + gap_score + link.score2
                edge = diags.get_edge(d_idx, link.subject_pos2)
                if edge is not None and edge.prefix_score > prefix_score:
                    return 0
                prefix_score_begin = prefix_score - link.score2
                path_min = min(path_min, prefix_score - link.score2)
                if prefix_e == path_max:
                    path_max -= diff1
                link_j = link.subject_pos2
        else:
            prefix_score = (e.prefix_score + gap_score
                            - int(space_penalty * max(space - 1, 0))
                            + d.score)
            edge = diags.get_edge(d_idx, d.j)
            if edge is not None and edge.prefix_score > prefix_score:
                return 0
            prefix_score_begin = prefix_score - d.score
            path_max = e.path_max
            path_min = min(e.path_min, prefix_score - d.score)
            link_j = d.j

        if prefix_score > d.score:
            path_max = max(path_max, prefix_score)
            diags.add_edge(_Edge(
                prefix_score, path_max, link_j, d_idx, e_idx,
                prefix_score if prefix_score == path_max else path_min,
                prefix_score_begin))
        return prefix_score

    def forward_pass(self, space_penalty):
        """reference greedy_align.cpp:277-360.  window: ordered map
        diag -> node, kept as a sorted key list + dict."""
        diags = self.diags
        keys: list[int] = []
        vals: dict[int, int] = {}
        for node in range(len(diags.nodes)):
            diags.init_node(node)
            d = diags.nodes[node]
            dd = d.diag
            if dd not in vals:
                insort(keys, dd)
                vals[dd] = node
            i_idx = bisect_left(keys, dd)

            # downward loop (smaller diagonals)
            j = i_idx
            max_j = 0
            if i_idx > 0:
                while True:
                    j -= 1
                    de = keys[j]
                    e_node = vals[de]
                    e = diags.nodes[e_node]
                    if (e.prefix_score
                            - int(space_penalty
                                  * max(d.j - e.subject_end, 0))) <= 0:
                        del keys[j]
                        del vals[de]
                        i_idx -= 1
                        if j == 0:
                            break
                        continue
                    if e.subject_end < max_j:
                        if j == 0:
                            break
                        continue
                    self.get_approximate_link(node, e_node, space_penalty)
                    max_j = max(max_j, min(d.j, e.subject_end))
                    if (e.subject_end - (d.subject_end
                                         - min(e.diag - d.diag, 0))
                            >= REVERSE_LINK_MIN_OVERHANG):
                        self.get_approximate_link(e_node, node, space_penalty)
                    if j == 0:
                        break

            # upward loop (larger diagonals)
            j = i_idx
            if j < len(keys) and vals[keys[j]] == node:
                j += 1
            max_i = 0
            while j < len(keys):
                de = keys[j]
                e_node = vals[de]
                e = diags.nodes[e_node]
                if (e.prefix_score
                        - int(space_penalty
                              * max(d.j - e.subject_end, 0))) <= 0 \
                        and de != dd:
                    del keys[j]
                    del vals[de]
                    continue
                if e.query_end < max_i:
                    j += 1
                    continue
                self.get_approximate_link(node, e_node, space_penalty)
                if e.i < d.i:
                    max_i = max(max_i, min(e.query_end, d.i))
                if (e.subject_end - (d.subject_end
                                     - min(e.diag - d.diag, 0))
                        >= REVERSE_LINK_MIN_OVERHANG):
                    self.get_approximate_link(e_node, node, space_penalty)
                j += 1
            vals[dd] = node

    # -- backtrace -------------------------------------------------------
    def _backtrace_old(self, node, j_end, t, score_max, score_min,
                       max_shift, next_holder):
        """reference backtrace.cpp:70-164 (no transcript output)."""
        diags = self.diags
        d = diags.nodes[node]
        f = diags.get_edge(node, j_end)
        at_end = f is None
        prefix_score = d.score if at_end else f.prefix_score
        if prefix_score > score_max:
            return False
        score_min = min(score_min, 0 if at_end else f.prefix_score_begin)
        if not at_end:
            e = diags.nodes[f.node_out]
            shift = d.diag - e.diag
            j = f.j
            if abs(shift) <= max_shift:
                bt = self._backtrace_old(f.node_out,
                                         j if shift > 0 else j + shift, t,
                                         score_max, score_min, max_shift,
                                         next_holder)
                if not bt:
                    if f.prefix_score_begin > score_min:
                        return False
                    at_end = True
            else:
                next_holder[0] = f.node_out
                at_end = True
        if at_end:
            t.query_begin = d.i
            t.subject_begin = d.j
            t.score = score_max - score_min
        dd = d.diag
        t.d_max = max(t.d_max, dd)
        t.d_min = min(t.d_min, dd)
        return True

    def _backtrace_one(self, top_node, max_shift, max_j):
        """reference backtrace.cpp:272-295; returns (t, next)."""
        t = ApproxHsp(d_min=INT_MAX, d_max=INT_MIN, score=0, query_begin=0,
                      query_end=0, subject_begin=0, subject_end=0)
        next_holder = [None]
        d = self.diags.nodes[top_node]
        t.subject_end = d.subject_end
        t.query_end = d.query_end
        self._backtrace_old(top_node, min(d.subject_end, max_j), t,
                            d.prefix_score, d.prefix_score, max_shift,
                            next_holder)
        return t, next_holder[0]

    def _disjoint(self, ts, t_begin, qr, sr, score, cutoff):
        """reference backtrace.cpp:37-68 (both overloads share this)."""
        for h in ts[t_begin:]:
            lt = sr[1] - sr[0]
            lq = qr[1] - qr[0]
            ot = (_overlap(sr, (h.subject_begin, h.subject_end)) / lt
                  if lt else 0.0)
            oq = (_overlap(qr, (h.query_begin, h.query_end)) / lq
                  if lq else 0.0)
            if (1.0 - min(ot, oq)) * score / h.score >= STACKED_HSP_RATIO:
                continue
            if (1.0 - max(ot, oq)) * score < cutoff:
                return False
        return True

    def _backtrace_node(self, top_node, ts, t_begin_holder, cutoff,
                        max_shift):
        """reference backtrace.cpp:297-327."""
        max_score = 0
        max_j = self.subject_len
        next_node = top_node
        while next_node is not None:
            t, nxt = self._backtrace_one(next_node, max_shift, max_j)
            if t.score > 0:
                max_j = t.subject_begin
            if t.score >= cutoff and self._disjoint(
                    ts, t_begin_holder[0],
                    (t.query_begin, t.query_end),
                    (t.subject_begin, t.subject_end), t.score, cutoff):
                if t_begin_holder[0] is None or t_begin_holder[0] >= len(ts):
                    t_begin_holder[0] = len(ts)
                ts.append(t)
                max_score = max(max_score, t.score)
            next_node = nxt
        return max_score

    def backtrace(self, ts, cutoff, max_shift):
        """reference backtrace.cpp:329-357."""
        diags = self.diags
        cands = [k for k in range(len(diags.nodes))
                 if diags.nodes[k].rel_score() >= cutoff]
        cands.sort(key=lambda k: (-diags.nodes[k].rel_score(), k))
        max_score = 0
        t_begin_holder = [len(ts)]
        for k in cands:
            d = diags.nodes[k]
            if self._disjoint(ts, t_begin_holder[0], (d.i, d.query_end),
                              (d.j, d.subject_end), d.score, cutoff):
                max_score = max(max_score,
                                self._backtrace_node(k, ts, t_begin_holder,
                                                     cutoff, max_shift))
        return max_score

    def run(self, segments, space_penalty=SPACE_PENALTY, cutoff=19,
            max_shift=2000):
        """reference greedy_align.cpp:362-391 Aligner::run
        (chaining-len-cap 2.0 above chaining-min-nodes 200)."""
        self.diags.load(segments)
        nodes = self.diags.nodes
        if len(nodes) > 200:
            order = sorted(range(len(nodes)),
                           key=lambda k: (-nodes[k].score, k))
            cap = self.query_len * 2.0
            total = 0.0
            it = 0
            while it < len(order) and total < cap:
                total += nodes[order[it]].len
                it += 1
            keep = order[: max(200, it)]
            self.diags.nodes = [nodes[k] for k in sorted(keep)]
        self.diags.sort()
        self.diags.prune()
        ts: list[ApproxHsp] = []
        self.forward_pass(space_penalty)
        self.backtrace(ts, cutoff, max_shift)
        return ts


def _overlap(a, b):
    return max(0, min(a[1], b[1]) - max(a[0], b[0]))


def chain_graph(segments, query, subject, matrix32, gap_open, gap_extend,
                query_len=None, subject_len=None):
    """Chaining::run (reference greedy_align.cpp:482-497): single segments
    pass through uncut; multi-segment targets run the graph aligner, then
    merge_hsps."""
    from diamond_tpu.align.chain import merge_hsps

    if not segments:
        return []
    if len(segments) == 1:
        s = segments[0]
        return [ApproxHsp(d_min=s.diag, d_max=s.diag, score=s.score,
                          query_begin=s.i, query_end=s.query_end,
                          subject_begin=s.j, subject_end=s.subject_end)]
    segs = sorted(segments, key=lambda s: (s.diag, s.j))
    al = Aligner(query, subject, matrix32, gap_open, gap_extend,
                 query_len=query_len, subject_len=subject_len)
    ts = al.run(segs)
    ts = merge_hsps(ts)
    return ts
