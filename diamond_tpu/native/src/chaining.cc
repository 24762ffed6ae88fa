// Greedy diagonal-graph chaining + fused per-query first-round stage
// (native twin of diamond_tpu/align/chaining_graph.py and the per-target
// loop of align/extend.py ungapped_stage; reference semantics from
// src/chaining/greedy_align.cpp, backtrace.cpp, diag_graph.h and
// src/align/ungapped.cpp:62-150).
//
// ungapped_stage_many runs, for every target of one query's ranking
// chunk: the (diag, j) stable sort of its seed hits, the x-drop chain
// extension with the skip rule, the DiagGraph forward pass + backtrace,
// and the pairwise HSP merge — emitting ApproxHsp rows
// [d_min, d_max, score, query_begin, query_end, subject_begin,
// subject_end] in a CSR layout.  The Python modules remain the
// bit-identical oracle.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" void xdrop_ungapped_one(const int8_t*, const int8_t*,
                                   const int8_t*, int64_t, int64_t,
                                   const int32_t*, int32_t, int64_t*);

namespace {

constexpr double SPACE_PENALTY = 0.1;
constexpr double GAP_PENALTY = 0.5;
constexpr int64_t LINK_PADDING = 10;
constexpr int64_t REVERSE_LINK_MIN_OVERHANG = 10;
constexpr int64_t RANGE_COVER = 8;
constexpr double STACKED_HSP_RATIO = 0.5;
constexpr int64_t CHAIN_CUTOFF = 19;
constexpr int64_t MAX_SHIFT = 2000;
constexpr int64_t I64_MIN = -(int64_t(1) << 62);
constexpr int64_t I64_MAX = int64_t(1) << 62;

struct Seg {
    int64_t i, j, len, score;
    int64_t diag() const { return i - j; }
    int64_t query_end() const { return i + len; }
    int64_t subject_end() const { return j + len; }
    int64_t subject_last() const { return j + len - 1; }
    Seg transpose() const { return Seg{j, i, len, score}; }
};

struct Hsp {
    int64_t d_min, d_max, score;
    int64_t query_begin, query_end, subject_begin, subject_end;
};

struct Edge {
    int64_t prefix_score, path_max, j, path_min, prefix_score_begin;
    int32_t node_in, node_out;
};

struct Node {
    int64_t i, j, len, score;
    int64_t prefix_score, path_max, path_min;
    std::vector<Edge> edges;  // per-node edge storage (the reference's
                              // single shifted vector, node-local)
    int64_t diag() const { return i - j; }
    int64_t query_end() const { return i + len; }
    int64_t subject_end() const { return j + len; }
    int64_t rel_score() const {
        return prefix_score == path_max ? prefix_score
                                        : prefix_score - path_min;
    }
};

struct Link {
    int64_t subject_pos1 = -1, query_pos1 = 0;
    int64_t subject_pos2 = 0, query_pos2 = 0;
    int64_t score1 = 0, score2 = 0;
    void transpose() {
        std::swap(subject_pos1, query_pos1);
        std::swap(subject_pos2, query_pos2);
    }
    void reset() {
        subject_pos1 = -1;
        score1 = 0;
        score2 = 0;
    }
};

inline int64_t score_range(const int32_t* m, const int8_t* q,
                           const int8_t* s, int64_t i, int64_t j,
                           int64_t j_end) {
    int64_t sc = 0;
    while (j < j_end) {
        sc += m[(q[i] & 31) * 32 + (s[j] & 31)];
        ++i;
        ++j;
    }
    return sc;
}

// reference greedy_align.cpp:150-200
int64_t get_hgap_link(const Seg& d1, const Seg& d2, const int8_t* query,
                      const int8_t* subject, Link& link, int64_t padding,
                      const int32_t* m) {
    const int64_t d = d1.diag() - d2.diag();
    const int64_t j2_end = std::min(
        std::max(d2.j, d1.subject_last() + d + 1 + padding),
        d2.subject_last());
    int64_t j1;
    bool space;
    if (d1.subject_last() < d2.j - d - 1) {
        j1 = d1.subject_last();
        space = true;
    } else {
        j1 = std::max(d2.j - d - 1 - padding, d1.j);
        space = false;
    }
    int64_t j2 = j1 + d + 1;
    int64_t i1 = d1.i + (j1 - d1.j);
    int64_t i2 = i1 + 1;
    if (j2 > d2.subject_last()) {
        link.reset();
        return I64_MIN;
    }
    int64_t score1 = 0;
    int64_t score2 = score_range(m, query, subject, i2, j2, d2.j) + d2.score -
                     score_range(m, query, subject, d2.i, d2.j, j2);
    int64_t max_score = I64_MIN;
    while (true) {
        if (score1 + score2 > max_score) {
            max_score = score1 + score2;
            link.query_pos1 = i1;
            link.subject_pos1 = j1;
            link.query_pos2 = i2;
            link.subject_pos2 = j2;
            link.score1 = score1;
            link.score2 = score2;
        }
        score2 -= m[(query[i2] & 31) * 32 + (subject[j2] & 31)];
        ++i1;
        ++i2;
        ++j1;
        ++j2;
        if (j2 > j2_end)
            break;
        score1 += m[(query[i1] & 31) * 32 + (subject[j1] & 31)];
    }
    const int64_t j1_end = j2_end - d;
    if (space) {
        link.score1 += d1.score;
    } else {
        link.score1 += d1.score -
                       score_range(m, query, subject, d1.diag() + j1_end,
                                   j1_end, d1.subject_end()) +
                       score_range(m, query, subject, d1.query_end(),
                                   d1.subject_end(), j1_end) -
                       score1;
    }
    return max_score;
}

int64_t get_link(const Seg& d1, const Seg& d2, const int8_t* query,
                 const int8_t* subject, Link& link, int64_t padding,
                 const int32_t* m) {
    if (d1.diag() < d2.diag()) {
        const int64_t s = get_hgap_link(d1.transpose(), d2.transpose(),
                                        subject, query, link, padding, m);
        link.transpose();
        return s;
    }
    return get_hgap_link(d1, d2, query, subject, link, padding, m);
}

struct Aligner {
    const int8_t* query;
    const int8_t* subject;
    const int32_t* matrix32;
    int64_t gap_open, gap_extend;
    int64_t query_len, subject_len;
    std::vector<Node> nodes;

    // reference diag_graph.h:150-171 (the node's edges iterated in
    // reverse insertion order; strict > keeps the later edge on ties)
    const Edge* get_edge(int32_t node, int64_t j) const {
        const Node& d = nodes[node];
        if (d.score == 0)
            return d.edges.empty() ? nullptr : &d.edges.back();
        int64_t max_score = d.score;
        const Edge* best = nullptr;
        for (auto it = d.edges.rbegin(); it != d.edges.rend(); ++it) {
            if (it->j < j && it->prefix_score > max_score) {
                best = &*it;
                max_score = it->prefix_score;
            }
        }
        return best;
    }

    void add_edge(const Edge& e) {
        Node& d = nodes[e.node_in];
        if (e.prefix_score > d.prefix_score) {
            d.prefix_score = e.prefix_score;
            d.path_max = e.path_max;
            d.path_min = e.path_min;
        }
        d.edges.push_back(e);
    }

    void prefix_score3(int32_t node, int64_t j, int64_t& ps, int64_t& pmax,
                       int64_t& pmin) const {
        const Edge* e = get_edge(node, j);
        const Node& n = nodes[node];
        if (!e) {
            ps = pmax = pmin = n.score;
            return;
        }
        ps = std::max(n.score, e->prefix_score);
        pmax = std::max(n.score, e->path_max);
        pmin = e->path_min;
    }

    // reference greedy_align.cpp:221-275
    int64_t get_approximate_link(int32_t d_idx, int32_t e_idx,
                                 double space_penalty) {
        Node& d = nodes[d_idx];
        Node& e = nodes[e_idx];
        const int64_t shift = d.diag() - e.diag();
        const int64_t gap_score =
            shift != 0 ? -gap_open - std::abs(shift) * gap_extend : 0;
        const int64_t space =
            shift > 0 ? d.j - e.subject_end() : d.i - e.query_end();
        int64_t prefix_score = 0;
        int64_t path_max = 0, path_min = 0, prefix_score_begin = 0;
        int64_t link_j = 0;
        if (space <= 0 || space_penalty == 0.0) {
            const Edge* edge = get_edge(d_idx, d.j);
            if (edge &&
                edge->prefix_score > e.prefix_score + gap_score + d.score)
                return 0;
            Link link;
            if (get_link(Seg{e.i, e.j, e.len, e.score},
                         Seg{d.i, d.j, d.len, d.score}, query, subject, link,
                         LINK_PADDING, matrix32) > 0) {
                const int64_t diff1 = e.score - link.score1;
                int64_t prefix_e;
                prefix_score3(e_idx, link.subject_pos1, prefix_e, path_max,
                              path_min);
                prefix_score = prefix_e - diff1 + gap_score + link.score2;
                edge = get_edge(d_idx, link.subject_pos2);
                if (edge && edge->prefix_score > prefix_score)
                    return 0;
                prefix_score_begin = prefix_score - link.score2;
                path_min = std::min(path_min, prefix_score - link.score2);
                if (prefix_e == path_max)
                    path_max -= diff1;
                link_j = link.subject_pos2;
            }
        } else {
            prefix_score = e.prefix_score + gap_score -
                           (int64_t)(space_penalty *
                                     (double)std::max(space - 1, int64_t(0))) +
                           d.score;
            const Edge* edge = get_edge(d_idx, d.j);
            if (edge && edge->prefix_score > prefix_score)
                return 0;
            prefix_score_begin = prefix_score - d.score;
            path_max = e.path_max;
            path_min = std::min(e.path_min, prefix_score - d.score);
            link_j = d.j;
        }
        if (prefix_score > d.score) {
            path_max = std::max(path_max, prefix_score);
            add_edge(Edge{prefix_score, path_max, link_j,
                          prefix_score == path_max ? prefix_score : path_min,
                          prefix_score_begin, d_idx, e_idx});
        }
        return prefix_score;
    }

    // reference greedy_align.cpp:277-360; window = sorted (diag, node)
    void forward_pass(double space_penalty) {
        std::vector<std::pair<int64_t, int32_t>> win;  // (diag, node)
        win.reserve(nodes.size());
        for (int32_t node = 0; node < (int32_t)nodes.size(); ++node) {
            Node& d = nodes[node];
            const int64_t dd = d.diag();
            auto pos = std::lower_bound(
                win.begin(), win.end(), std::make_pair(dd, INT32_MIN));
            if (pos == win.end() || pos->first != dd)
                pos = win.insert(pos, {dd, node});
            int64_t i_idx = pos - win.begin();

            // downward loop (smaller diagonals)
            int64_t j = i_idx;
            int64_t max_j = 0;
            if (i_idx > 0) {
                while (true) {
                    --j;
                    const int32_t e_node = win[j].second;
                    const Node& e = nodes[e_node];
                    if (e.prefix_score -
                            (int64_t)(space_penalty *
                                      (double)std::max(d.j - e.subject_end(),
                                                       int64_t(0))) <=
                        0) {
                        win.erase(win.begin() + j);
                        --i_idx;
                        if (j == 0)
                            break;
                        continue;
                    }
                    if (e.subject_end() < max_j) {
                        if (j == 0)
                            break;
                        continue;
                    }
                    get_approximate_link(node, e_node, space_penalty);
                    max_j = std::max(max_j,
                                     std::min(d.j, e.subject_end()));
                    if (e.subject_end() -
                            (d.subject_end() -
                             std::min(e.diag() - d.diag(), int64_t(0))) >=
                        REVERSE_LINK_MIN_OVERHANG)
                        get_approximate_link(e_node, node, space_penalty);
                    if (j == 0)
                        break;
                }
            }

            // upward loop (larger diagonals)
            j = i_idx;
            if (j < (int64_t)win.size() && win[j].second == node)
                ++j;
            int64_t max_i = 0;
            while (j < (int64_t)win.size()) {
                const int64_t de = win[j].first;
                const int32_t e_node = win[j].second;
                const Node& e = nodes[e_node];
                if (e.prefix_score -
                            (int64_t)(space_penalty *
                                      (double)std::max(d.j - e.subject_end(),
                                                       int64_t(0))) <=
                        0 &&
                    de != dd) {
                    win.erase(win.begin() + j);
                    continue;
                }
                if (e.query_end() < max_i) {
                    ++j;
                    continue;
                }
                get_approximate_link(node, e_node, space_penalty);
                if (e.i < d.i)
                    max_i = std::max(max_i, std::min(e.query_end(), d.i));
                if (e.subject_end() -
                        (d.subject_end() -
                         std::min(e.diag() - d.diag(), int64_t(0))) >=
                    REVERSE_LINK_MIN_OVERHANG)
                    get_approximate_link(e_node, node, space_penalty);
                ++j;
            }
            // (re)bind this diagonal to the current node
            auto pos2 = std::lower_bound(
                win.begin(), win.end(), std::make_pair(dd, INT32_MIN));
            if (pos2 != win.end() && pos2->first == dd)
                pos2->second = node;
            else
                win.insert(pos2, {dd, node});
        }
    }

    // reference backtrace.cpp:70-164 (no transcript output)
    bool backtrace_old(int32_t node, int64_t j_end, Hsp& t,
                       int64_t score_max, int64_t score_min,
                       int32_t* next_holder) const {
        const Node& d = nodes[node];
        const Edge* f = get_edge(node, j_end);
        bool at_end = f == nullptr;
        const int64_t prefix_score = at_end ? d.score : f->prefix_score;
        if (prefix_score > score_max)
            return false;
        score_min =
            std::min(score_min, at_end ? int64_t(0) : f->prefix_score_begin);
        if (!at_end) {
            const Node& e = nodes[f->node_out];
            const int64_t shift = d.diag() - e.diag();
            const int64_t j = f->j;
            if (std::abs(shift) <= MAX_SHIFT) {
                const bool bt =
                    backtrace_old(f->node_out, shift > 0 ? j : j + shift, t,
                                  score_max, score_min, next_holder);
                if (!bt) {
                    if (f->prefix_score_begin > score_min)
                        return false;
                    at_end = true;
                }
            } else {
                *next_holder = f->node_out;
                at_end = true;
            }
        }
        if (at_end) {
            t.query_begin = d.i;
            t.subject_begin = d.j;
            t.score = score_max - score_min;
        }
        const int64_t dd = d.diag();
        t.d_max = std::max(t.d_max, dd);
        t.d_min = std::min(t.d_min, dd);
        return true;
    }

    // reference backtrace.cpp:272-295
    void backtrace_one(int32_t top_node, int64_t max_j, Hsp& t,
                       int32_t& next) const {
        const Node& d = nodes[top_node];
        t = Hsp{I64_MAX, I64_MIN, 0, 0, d.query_end(), 0, d.subject_end()};
        next = -1;
        backtrace_old(top_node, std::min(d.subject_end(), max_j), t,
                      d.prefix_score, d.prefix_score, &next);
    }

    // reference backtrace.cpp:37-68
    static bool disjoint(const std::vector<Hsp>& ts, int64_t t_begin,
                         int64_t qb, int64_t qe, int64_t sb, int64_t se,
                         int64_t score, int64_t cutoff) {
        for (int64_t k = t_begin; k < (int64_t)ts.size(); ++k) {
            const Hsp& h = ts[k];
            const int64_t lt = se - sb;
            const int64_t lq = qe - qb;
            const int64_t ovt = std::max(
                int64_t(0),
                std::min(se, h.subject_end) - std::max(sb, h.subject_begin));
            const int64_t ovq = std::max(
                int64_t(0),
                std::min(qe, h.query_end) - std::max(qb, h.query_begin));
            const double ot = lt ? (double)ovt / (double)lt : 0.0;
            const double oq = lq ? (double)ovq / (double)lq : 0.0;
            if ((1.0 - std::min(ot, oq)) * (double)score / (double)h.score >=
                STACKED_HSP_RATIO)
                continue;
            if ((1.0 - std::max(ot, oq)) * (double)score < (double)cutoff)
                return false;
        }
        return true;
    }

    // reference backtrace.cpp:297-327
    int64_t backtrace_node(int32_t top_node, std::vector<Hsp>& ts,
                           int64_t& t_begin, int64_t cutoff) const {
        int64_t max_score = 0;
        int64_t max_j = subject_len;
        int32_t next_node = top_node;
        while (next_node >= 0) {
            Hsp t;
            int32_t nxt;
            backtrace_one(next_node, max_j, t, nxt);
            if (t.score > 0)
                max_j = t.subject_begin;
            if (t.score >= cutoff &&
                disjoint(ts, t_begin, t.query_begin, t.query_end,
                         t.subject_begin, t.subject_end, t.score, cutoff)) {
                if (t_begin >= (int64_t)ts.size())
                    t_begin = ts.size();
                ts.push_back(t);
                max_score = std::max(max_score, t.score);
            }
            next_node = nxt;
        }
        return max_score;
    }

    // reference backtrace.cpp:329-357
    void backtrace(std::vector<Hsp>& ts, int64_t cutoff) const {
        std::vector<int32_t> cands;
        for (int32_t k = 0; k < (int32_t)nodes.size(); ++k)
            if (nodes[k].rel_score() >= cutoff)
                cands.push_back(k);
        std::stable_sort(cands.begin(), cands.end(),
                         [&](int32_t a, int32_t b) {
                             return nodes[a].rel_score() >
                                    nodes[b].rel_score();
                         });
        int64_t t_begin = ts.size();
        for (const int32_t k : cands) {
            const Node& d = nodes[k];
            if (disjoint(ts, t_begin, d.i, d.query_end(), d.j,
                         d.subject_end(), d.score, cutoff))
                backtrace_node(k, ts, t_begin, cutoff);
        }
    }

    // reference greedy_align.cpp:56-70 — one node per diagonal run start
    void load(const Seg* segs, int64_t n) {
        int64_t d = I64_MIN;
        int64_t max_j_end = I64_MIN;
        for (int64_t k = 0; k < n; ++k) {
            const Seg& s = segs[k];
            const int64_t d2 = s.diag();
            if (d2 != d) {
                d = d2;
                nodes.push_back(Node{s.i, s.j, s.len, s.score, s.score,
                                     s.score, s.score, {}});
                max_j_end = nodes.back().subject_end();
            } else if (max_j_end < s.j) {
                nodes.push_back(Node{s.i, s.j, s.len, s.score, s.score,
                                     s.score, s.score, {}});
                max_j_end = std::max(max_j_end, nodes.back().subject_end());
            }
        }
    }

    // reference greedy_align.cpp:100-122 (chaining-range-cover 8)
    void prune() {
        std::vector<Node> finished;
        std::vector<Node> window;
        for (Node& d : nodes) {
            int64_t n = 0;
            std::vector<Node> w2;
            for (Node& e : window) {
                if (e.subject_end() > d.j) {
                    if (e.score >= d.score && e.j <= d.j &&
                        e.subject_end() >= d.subject_end())
                        ++n;
                    w2.push_back(std::move(e));
                } else {
                    finished.push_back(std::move(e));
                }
            }
            window = std::move(w2);
            if (n <= RANGE_COVER)
                window.push_back(std::move(d));
        }
        for (Node& e : window)
            finished.push_back(std::move(e));
        nodes = std::move(finished);
    }

    // reference greedy_align.cpp:362-391 Aligner::run
    void run(const Seg* segs, int64_t n, std::vector<Hsp>& ts) {
        load(segs, n);
        if ((int64_t)nodes.size() > 200) {
            std::vector<int32_t> order(nodes.size());
            for (size_t k = 0; k < order.size(); ++k)
                order[k] = (int32_t)k;
            std::stable_sort(order.begin(), order.end(),
                             [&](int32_t a, int32_t b) {
                                 return nodes[a].score > nodes[b].score;
                             });
            const double cap = (double)query_len * 2.0;
            double total = 0.0;
            int64_t it = 0;
            while (it < (int64_t)order.size() && total < cap) {
                total += (double)nodes[order[it]].len;
                ++it;
            }
            order.resize(std::max(int64_t(200), it));
            std::sort(order.begin(), order.end());
            std::vector<Node> kept;
            kept.reserve(order.size());
            for (const int32_t k : order)
                kept.push_back(std::move(nodes[k]));
            nodes = std::move(kept);
        }
        std::stable_sort(nodes.begin(), nodes.end(),
                         [](const Node& a, const Node& b) {
                             return a.j != b.j ? a.j < b.j : a.i < b.i;
                         });
        prune();
        forward_pass(SPACE_PENALTY);
        backtrace(ts, CHAIN_CUTOFF);
    }
};

// reference greedy_align.cpp:427-438
inline int64_t merge_score(const Hsp& h1, const Hsp& h2) {
    const int64_t gq = h2.query_begin - h1.query_end;
    const int64_t gt = h2.subject_begin - h1.subject_end;
    if (gq < 0 || gt < 0)
        return 0;
    const int64_t s = h1.score + h2.score;
    if (gq > gt)
        return (int64_t)((double)s - (double)gq * GAP_PENALTY -
                         (double)gt * SPACE_PENALTY);
    return (int64_t)((double)s - (double)gt * GAP_PENALTY -
                     (double)gq * SPACE_PENALTY);
}

inline Hsp merge2(const Hsp& h1, const Hsp& h2) {
    return Hsp{std::min(h1.d_min, h2.d_min), std::max(h1.d_max, h2.d_max),
               merge_score(h1, h2), h1.query_begin, h2.query_end,
               h1.subject_begin, h2.subject_end};
}

// reference greedy_align.cpp:461-482
void merge_hsps(std::vector<Hsp>& out) {
    size_t i = 0;
    while (i < out.size()) {
        size_t k = i + 1;
        while (k < out.size()) {
            if (merge_score(out[i], out[k]) >
                std::max(out[i].score, out[k].score)) {
                out[i] = merge2(out[i], out[k]);
                out.erase(out.begin() + k);
            } else if (merge_score(out[k], out[i]) >
                       std::max(out[i].score, out[k].score)) {
                out[i] = merge2(out[k], out[i]);
                out.erase(out.begin() + k);
            } else {
                ++k;
            }
        }
        ++i;
    }
}

}  // namespace

// Chaining::run for one target (reference greedy_align.cpp:482-497):
// a single segment passes through uncut; multiple run the graph aligner
// then merge_hsps.  Appends to ts.
namespace {
void chain_one(const int8_t* query, const int8_t* subject,
               const int32_t* matrix32, int64_t gap_open, int64_t gap_extend,
               int64_t query_len, int64_t subject_len, Seg* segs, int64_t n,
               std::vector<Hsp>& ts) {
    if (n == 0)
        return;
    if (n == 1) {
        const Seg& s = segs[0];
        ts.push_back(Hsp{s.diag(), s.diag(), s.score, s.i, s.query_end(),
                         s.j, s.subject_end()});
        return;
    }
    std::stable_sort(segs, segs + n, [](const Seg& a, const Seg& b) {
        const int64_t da = a.diag(), db = b.diag();
        return da != db ? da < db : a.j < b.j;
    });
    Aligner al{query, subject, matrix32, gap_open, gap_extend, query_len,
               subject_len, {}};
    al.run(segs, n, ts);
    merge_hsps(ts);
}
}  // namespace

// Fused first-round extension stage for one query over a chunk of
// targets (native twin of the per-target loop in align/extend.py
// extend_query_gen; reference ungapped.cpp:62-150 + greedy_align.cpp).
// Inputs are CSR seed-hit arrays per target; hits need not be pre-sorted
// (the (diag, j) stable sort runs here).  Outputs: per-target max hit
// score, and ApproxHsp rows [d_min, d_max, score, qb, qe, sb, se] in CSR
// (out_start[nt+1], out_hsp capacity = total hit count).  Returns total
// HSP rows written, or -1 if the output would exceed `cap` rows (the
// caller falls back to the Python oracle; the backtrace can in rare
// cases emit more HSPs than seed hits).
extern "C" int64_t ungapped_stage_many(
    const int8_t* q,           // padded query view (letters + q_start)
    const int8_t* bias,        // Hauser bias over the query view, or null
    const int8_t* t_letters,   // target block letters base
    const int64_t* t_starts,   // absolute start per chunk target [nt]
    const int64_t* t_lens,     // true length per chunk target [nt]
    const int64_t* grp_start,  // CSR offsets into hit arrays [nt+1]
    const int64_t* hit_i, const int64_t* hit_j, const int64_t* hit_score,
    int64_t nt, const int32_t* matrix32, int32_t xdrop,
    int64_t gap_open, int64_t gap_extend, int64_t query_len,
    int64_t cap,              // out_hsp row capacity
    int64_t* ungapped_score,  // [nt]
    int64_t* out_start,       // [nt+1]
    int64_t* out_hsp) {       // [cap, 7]
    std::vector<int64_t> idx;
    std::vector<Seg> segs;
    std::vector<Hsp> ts;
    int64_t written = 0;
    out_start[0] = 0;
    for (int64_t t = 0; t < nt; ++t) {
        const int64_t h0 = grp_start[t], h1 = grp_start[t + 1];
        const int64_t nh = h1 - h0;
        const int8_t* subject = t_letters + t_starts[t];
        int64_t best = 0;
        for (int64_t k = h0; k < h1; ++k)
            best = std::max(best, hit_score[k]);
        ungapped_score[t] = best;
        // (diag, j) stable sort of the hit order (align/extend.py:207)
        idx.resize(nh);
        for (int64_t k = 0; k < nh; ++k)
            idx[k] = h0 + k;
        std::stable_sort(idx.begin(), idx.end(),
                         [&](int64_t a, int64_t b) {
                             const int64_t da = hit_i[a] - hit_j[a];
                             const int64_t db = hit_i[b] - hit_j[b];
                             return da != db ? da < db
                                             : hit_j[a] < hit_j[b];
                         });
        // x-drop chain extension with the skip rule (ungapped.cpp:62-150)
        segs.clear();
        int64_t one[4];
        for (int64_t k = 0; k < nh; ++k) {
            const int64_t i = hit_i[idx[k]], j = hit_j[idx[k]];
            if (!segs.empty() && segs.back().diag() == i - j &&
                segs.back().subject_end() >= j)
                continue;
            xdrop_ungapped_one(q, bias, subject, i, j, matrix32, xdrop, one);
            if (one[3] > 0)
                segs.push_back(Seg{one[0], one[1], one[2], one[3]});
        }
        ts.clear();
        chain_one(q, subject, matrix32, gap_open, gap_extend, query_len,
                  t_lens[t], segs.data(), (int64_t)segs.size(), ts);
        if (written + (int64_t)ts.size() > cap)
            return -1;
        for (const Hsp& h : ts) {
            int64_t* row = out_hsp + 7 * written;
            row[0] = h.d_min;
            row[1] = h.d_max;
            row[2] = h.score;
            row[3] = h.query_begin;
            row[4] = h.query_end;
            row[5] = h.subject_begin;
            row[6] = h.subject_end;
            ++written;
        }
        out_start[t + 1] = written;
    }
    return written;
}

// ungapped_stage_many with the chunk selection done natively: callers
// pass the per-query CSR (ha.gstart/hi/hj/hscore over ALL targets) plus
// the ranking-chunk target indices; the per-chunk gathers that the
// Python wrapper used to do with ~8 numpy calls per query become two
// small C loops.
extern "C" int64_t ungapped_stage_chunk_sel(
    const int8_t* q, const int8_t* bias, const int8_t* t_letters,
    const int64_t* chunk, int64_t nt, const int64_t* tids,
    const int64_t* block_starts, const int64_t* block_lens,
    const int64_t* gstart, const int64_t* hit_i, const int64_t* hit_j,
    const int64_t* hit_score, const int32_t* matrix32, int32_t xdrop,
    int64_t gap_open, int64_t gap_extend, int64_t query_len, int64_t cap,
    int64_t* ungapped_score, int64_t* out_start, int64_t* out_hsp) {
    static thread_local std::vector<int64_t> ts, tl, gs, hi, hj, hs;
    ts.resize(nt);
    tl.resize(nt);
    gs.resize(nt + 1);
    gs[0] = 0;
    for (int64_t t = 0; t < nt; ++t) {
        const int64_t g = chunk[t];
        ts[t] = block_starts[tids[g]];
        tl[t] = block_lens[tids[g]];
        gs[t + 1] = gs[t] + (gstart[g + 1] - gstart[g]);
    }
    hi.resize(gs[nt]);
    hj.resize(gs[nt]);
    hs.resize(gs[nt]);
    int64_t o = 0;
    for (int64_t t = 0; t < nt; ++t) {
        const int64_t g = chunk[t];
        for (int64_t k = gstart[g]; k < gstart[g + 1]; ++k, ++o) {
            hi[o] = hit_i[k];
            hj[o] = hit_j[k];
            hs[o] = hit_score[k];
        }
    }
    return ungapped_stage_many(q, bias, t_letters, ts.data(), tl.data(),
                               gs.data(), hi.data(), hj.data(), hs.data(),
                               nt, matrix32, xdrop, gap_open, gap_extend,
                               query_len, cap, ungapped_score, out_start,
                               out_hsp);
}
