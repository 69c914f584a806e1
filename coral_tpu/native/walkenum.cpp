// walkenum: native candidate-walk enumeration for cycle extraction.
//
// C++ twin of coral_tpu/cycles/candidates.py: depth-first enumeration of
// closed walks (cycles) and terminal-to-terminal walks (paths) over a
// breakpoint graph where every node touches exactly one sequence edge, with
// per-edge multiplicity caps, iterative deepening on breakpoint-edge count,
// and multiset deduplication.  Emission order and content match the Python
// implementation exactly (differential-tested), at ~100x the state
// throughput — this is the combinatorial hot loop of the decomposition.
//
// Edge keys are opaque int32s supplied by the caller (type<<24|index in the
// Python key space); the engine only needs the graph structure.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_set>
#include <vector>

namespace {

struct WalkEnum {
  // graph
  int32_t n_nodes = 0, n_seq = 0, n_bp = 0;
  std::vector<int32_t> seq_left, seq_right;   // node ids per seq edge
  std::vector<int64_t> seq_len;
  std::vector<int32_t> node_seq;              // seq edge id per node
  std::vector<int32_t> bp_n1, bp_n2, bp_cap, bp_key;
  std::vector<int32_t> adj_off, adj_ids;      // per-node bp adjacency
  std::vector<uint8_t> is_endnode;
  std::vector<int32_t> term_node, term_skey, term_tkey;
  // node -> terminal indices (built once; the DFS queries this at every
  // visited node, where a linear scan of the terminal list would cost
  // O(n_term * states) — mirrors the Python driver's exits_at)
  std::vector<int32_t> term_at_off, term_at_ids;
  int32_t max_mult = 10;
  int32_t max_bp_steps = 40;
  int64_t budget = 200000;
  bool truncated = false;
  int32_t depth_cap = 0;

  // multiset state during DFS: counts per key domain
  std::vector<int32_t> seq_cnt;     // per seq edge
  std::vector<int32_t> bp_cnt;      // per bp edge
  std::vector<int32_t> used_seq, used_bp;  // touched indices (for emit)

  // output
  std::unordered_set<std::string> seen;
  std::vector<int64_t> cand_off{0};
  std::vector<int32_t> keys;
  std::vector<int32_t> counts;
  std::vector<uint8_t> iscycle;
  std::vector<double> seqweight;
};

void emit(WalkEnum* we, bool cycle, int32_t extra_key1, int32_t extra_key2) {
  // canonical serialized multiset: sorted (key,count) pairs
  std::vector<std::pair<int32_t, int32_t>> items;
  for (int32_t si : we->used_seq) {
    if (we->seq_cnt[si] > 0) items.push_back({si, we->seq_cnt[si]});
  }
  for (int32_t bi : we->used_bp) {
    if (we->bp_cnt[bi] > 0) items.push_back({we->bp_key[bi], we->bp_cnt[bi]});
  }
  if (extra_key1 >= 0) items.push_back({extra_key1, 1});
  if (extra_key2 >= 0) items.push_back({extra_key2, 1});
  // seq keys are (0<<24|idx) == idx, bp/terminal keys have type bits; sort
  std::sort(items.begin(), items.end());
  std::string ser(reinterpret_cast<const char*>(items.data()),
                  items.size() * sizeof(items[0]));
  if (!we->seen.insert(ser).second) return;
  double w = 0.0;
  for (size_t k = 0; k < items.size(); k++) {
    if ((items[k].first >> 24) == 0) {
      w += static_cast<double>(we->seq_len[items[k].first]) * items[k].second;
    }
  }
  for (auto& it : items) {
    we->keys.push_back(it.first);
    we->counts.push_back(it.second);
  }
  we->cand_off.push_back(static_cast<int64_t>(we->keys.size()));
  we->iscycle.push_back(cycle ? 1 : 0);
  we->seqweight.push_back(w);
}

inline void touch_seq(WalkEnum* we, int32_t si) {
  if (we->seq_cnt[si] == 0) we->used_seq.push_back(si);
  we->seq_cnt[si]++;
}

inline void untouch_seq(WalkEnum* we, int32_t si) {
  if (--we->seq_cnt[si] == 0) {
    if (we->used_seq.back() == si) {
      we->used_seq.pop_back();
    } else {  // LIFO always holds in DFS; defensive fallback
      we->used_seq.erase(
          std::find(we->used_seq.begin(), we->used_seq.end(), si));
    }
  }
}

inline void touch_bp(WalkEnum* we, int32_t bi) {
  if (we->bp_cnt[bi] == 0) we->used_bp.push_back(bi);
  we->bp_cnt[bi]++;
}

inline void untouch_bp(WalkEnum* we, int32_t bi) {
  if (--we->bp_cnt[bi] == 0) {
    if (we->used_bp.back() == bi) {
      we->used_bp.pop_back();
    } else {
      we->used_bp.erase(
          std::find(we->used_bp.begin(), we->used_bp.end(), bi));
    }
  }
}

int32_t seq_other_end(const WalkEnum* we, int32_t si, int32_t node) {
  return we->seq_left[si] == node ? we->seq_right[si] : we->seq_left[si];
}

void dfs_cycle(WalkEnum* we, int32_t start_entry, int32_t node, int32_t steps) {
  if (we->budget <= 0) { we->truncated = true; return; }
  we->budget--;
  for (int32_t a = we->adj_off[node]; a < we->adj_off[node + 1]; a++) {
    int32_t bi = we->adj_ids[a];
    if (we->bp_cnt[bi] >= we->bp_cap[bi]) continue;
    int32_t v = we->bp_n1[bi] == node ? we->bp_n2[bi] : we->bp_n1[bi];
    // self loops: both ends equal -> v == node
    if (we->bp_n1[bi] == we->bp_n2[bi]) v = node;
    if (we->is_endnode[v]) continue;
    touch_bp(we, bi);
    if (v == start_entry) emit(we, true, -1, -1);
    int32_t si = we->node_seq[v];
    if (we->seq_cnt[si] < we->max_mult && steps < we->depth_cap) {
      int32_t w = seq_other_end(we, si, v);
      if (!we->is_endnode[w]) {
        touch_seq(we, si);
        dfs_cycle(we, start_entry, w, steps + 1);
        untouch_seq(we, si);
      }
    }
    untouch_bp(we, bi);
  }
}

void dfs_path(WalkEnum* we, int32_t start_term, int32_t node, int32_t steps) {
  if (we->budget <= 0) { we->truncated = true; return; }
  we->budget--;
  for (int32_t a = we->term_at_off[node]; a < we->term_at_off[node + 1]; a++) {
    int32_t t = we->term_at_ids[a];
    emit(we, false, we->term_skey[start_term], we->term_tkey[t]);
  }
  if (we->is_endnode[node]) return;
  for (int32_t a = we->adj_off[node]; a < we->adj_off[node + 1]; a++) {
    int32_t bi = we->adj_ids[a];
    if (we->bp_cnt[bi] >= we->bp_cap[bi]) continue;
    int32_t v = we->bp_n1[bi] == node ? we->bp_n2[bi] : we->bp_n1[bi];
    if (we->bp_n1[bi] == we->bp_n2[bi]) v = node;
    if (we->is_endnode[v]) continue;
    int32_t si = we->node_seq[v];
    if (we->seq_cnt[si] >= we->max_mult || steps >= we->depth_cap) continue;
    int32_t w = seq_other_end(we, si, v);
    touch_bp(we, bi);
    touch_seq(we, si);
    dfs_path(we, start_term, w, steps + 1);
    untouch_seq(we, si);
    untouch_bp(we, bi);
  }
}

}  // namespace

extern "C" {

WalkEnum* we_create(
    int32_t n_nodes, int32_t n_seq,
    const int32_t* seq_left, const int32_t* seq_right, const int64_t* seq_len,
    const int32_t* node_seq,
    int32_t n_bp, const int32_t* bp_n1, const int32_t* bp_n2,
    const int32_t* bp_cap, const int32_t* bp_key,
    const int32_t* adj_off, const int32_t* adj_ids,
    const uint8_t* is_endnode,
    int32_t n_term, const int32_t* term_node, const int32_t* term_skey,
    const int32_t* term_tkey,
    int32_t max_mult, int32_t max_bp_steps, int64_t max_states) {
  auto* we = new WalkEnum();
  we->n_nodes = n_nodes;
  we->n_seq = n_seq;
  we->n_bp = n_bp;
  we->seq_left.assign(seq_left, seq_left + n_seq);
  we->seq_right.assign(seq_right, seq_right + n_seq);
  we->seq_len.assign(seq_len, seq_len + n_seq);
  we->node_seq.assign(node_seq, node_seq + n_nodes);
  we->bp_n1.assign(bp_n1, bp_n1 + n_bp);
  we->bp_n2.assign(bp_n2, bp_n2 + n_bp);
  we->bp_cap.assign(bp_cap, bp_cap + n_bp);
  we->bp_key.assign(bp_key, bp_key + n_bp);
  we->adj_off.assign(adj_off, adj_off + n_nodes + 1);
  we->adj_ids.assign(adj_ids, adj_ids + adj_off[n_nodes]);
  we->is_endnode.assign(is_endnode, is_endnode + n_nodes);
  we->term_node.assign(term_node, term_node + n_term);
  we->term_skey.assign(term_skey, term_skey + n_term);
  we->term_tkey.assign(term_tkey, term_tkey + n_term);
  we->max_mult = max_mult;
  we->max_bp_steps = max_bp_steps;
  we->budget = max_states;
  we->seq_cnt.assign(n_seq, 0);
  we->bp_cnt.assign(n_bp, 0);
  // bucket terminals by node (counting sort keeps terminal order stable
  // per node, matching the scan order the Python twin emits in)
  std::vector<int32_t> cnt(n_nodes + 1, 0);
  for (int32_t t = 0; t < n_term; t++) cnt[term_node[t] + 1]++;
  we->term_at_off.assign(n_nodes + 1, 0);
  for (int32_t v = 0; v < n_nodes; v++)
    we->term_at_off[v + 1] = we->term_at_off[v] + cnt[v + 1];
  we->term_at_ids.assign(n_term, 0);
  std::vector<int32_t> cur(we->term_at_off.begin(), we->term_at_off.end() - 1);
  for (int32_t t = 0; t < n_term; t++)
    we->term_at_ids[cur[term_node[t]]++] = t;
  return we;
}

void we_run(WalkEnum* we) {
  // iterative deepening, mirroring the Python driver
  int32_t depth = we->max_bp_steps < 4 ? we->max_bp_steps : 4;
  while (true) {
    we->depth_cap = depth;
    int64_t start_budget = we->budget;
    for (int32_t si = 0; si < we->n_seq; si++) {
      int32_t left = we->seq_left[si];
      int32_t right = we->seq_right[si];
      if (we->is_endnode[left] || we->is_endnode[right]) continue;
      touch_seq(we, si);
      dfs_cycle(we, left, right, 0);
      untouch_seq(we, si);
    }
    for (size_t t = 0; t < we->term_node.size(); t++) {
      int32_t node = we->term_node[t];
      int32_t si = we->node_seq[node];
      int32_t other = seq_other_end(we, si, node);
      touch_seq(we, si);
      dfs_path(we, static_cast<int32_t>(t), other, 0);
      untouch_seq(we, si);
    }
    if (depth >= we->max_bp_steps || we->truncated) break;
    if (we->budget <= 0) {
      // budget ran out exactly at a pass boundary: deeper walks were
      // never explored, so the pool IS truncated even though no dfs
      // call tripped the in-search guard (mirrors the Python driver,
      // candidates.py deepening loop)
      we->truncated = true;
      break;
    }
    if (we->budget == start_budget) break;
    depth = depth * 2 < we->max_bp_steps ? depth * 2 : we->max_bp_steps;
  }
}

void we_free(WalkEnum* we) { delete we; }
int64_t we_n_candidates(WalkEnum* we) {
  return static_cast<int64_t>(we->iscycle.size());
}
int32_t we_truncated(WalkEnum* we) { return we->truncated ? 1 : 0; }
const int64_t* we_cand_off(WalkEnum* we) { return we->cand_off.data(); }
const int32_t* we_keys(WalkEnum* we) { return we->keys.data(); }
const int32_t* we_counts(WalkEnum* we) { return we->counts.data(); }
const uint8_t* we_iscycle(WalkEnum* we) { return we->iscycle.data(); }
const double* we_seqweight(WalkEnum* we) { return we->seqweight.data(); }

}  // extern "C"
