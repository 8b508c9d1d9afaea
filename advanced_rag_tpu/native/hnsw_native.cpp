// HNSW baseline (clean-room, Malkov & Yashunin 2016 algorithm) — CPU.
//
// This is NOT part of the serving path.  The reference delegates ANN to
// Milvus's HNSW (M=16, efConstruction=200, ef=64 — reference
// indexing.py:150-153); our serving index is the device-resident
// IVF/IVF-PQ ladder.  The north-star metric is "recall@10 vs HNSW at
// equal memory" (BASELINE.json), and no HNSW library exists in this
// environment — so the baseline to compare AGAINST is implemented here
// and driven by scripts/bench_hnsw_parity.py.
//
// Layout: contiguous float vectors; level-0 links in one flat
// [N, 2M] int32 array; upper-level links in per-node heap blocks.
// Distances are negative inner product (vectors pre-normalized by the
// caller for cosine) so "smaller is closer" throughout.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

extern "C" {

struct HnswIndex;

}  // extern "C" (forward declaration only; definitions below)

namespace {

using std::size_t;

struct Neighbor {
  float dist;
  int32_t id;
};
struct NearCmp {  // min-heap on dist via greater-than comparator
  bool operator()(const Neighbor& a, const Neighbor& b) const {
    return a.dist > b.dist;
  }
};
struct FarCmp {  // max-heap on dist
  bool operator()(const Neighbor& a, const Neighbor& b) const {
    return a.dist < b.dist;
  }
};

}  // namespace

struct HnswIndex {
  int64_t n = 0;
  int32_t dim = 0;
  int32_t M = 16;
  int32_t M0 = 32;          // level-0 degree = 2M
  int32_t ef_construction = 200;
  double mult = 0.0;        // 1 / ln(M)
  int32_t max_level = -1;
  int32_t entry = -1;

  std::vector<float> data;            // [n, dim]
  std::vector<int32_t> level_of;      // [n]
  std::vector<int32_t> links0;        // [n, M0], -1 padded
  std::vector<int32_t> n_links0;      // [n]
  // upper levels: per node, levels 1..level_of[i] each M slots
  std::vector<std::vector<int32_t>> upper;    // flat [levels * M]
  std::vector<std::vector<int32_t>> n_upper;  // [levels]

  std::vector<uint32_t> visit_tag;    // visited-set epochs
  uint32_t cur_tag = 0;

  inline const float* vec(int32_t i) const { return data.data() + (size_t)i * dim; }

  inline float dist(const float* a, const float* b) const {
    float acc = 0.f;
    for (int32_t j = 0; j < dim; ++j) acc += a[j] * b[j];
    return -acc;  // negative IP: smaller = closer
  }

  inline int32_t* links(int32_t node, int32_t level, int32_t* cap) {
    if (level == 0) {
      *cap = M0;
      return links0.data() + (size_t)node * M0;
    }
    *cap = M;
    return upper[node].data() + (size_t)(level - 1) * M;
  }
  inline int32_t& link_count(int32_t node, int32_t level) {
    return level == 0 ? n_links0[node] : n_upper[node][level - 1];
  }

  // greedy single-entry descent at one level
  int32_t greedy(const float* q, int32_t start, int32_t level) {
    int32_t cur = start;
    float cur_d = dist(q, vec(cur));
    bool changed = true;
    while (changed) {
      changed = false;
      int32_t cap;
      const int32_t* nb = links(cur, level, &cap);
      int32_t cnt = link_count(cur, level);
      for (int32_t t = 0; t < cnt; ++t) {
        float d = dist(q, vec(nb[t]));
        if (d < cur_d) {
          cur_d = d;
          cur = nb[t];
          changed = true;
        }
      }
    }
    return cur;
  }

  // best-first beam search at one level -> up to ef closest (ascending)
  std::vector<Neighbor> search_layer(const float* q, int32_t start,
                                     int32_t ef, int32_t level) {
    if (++cur_tag == 0) {  // epoch wraparound: reset tags
      std::fill(visit_tag.begin(), visit_tag.end(), 0);
      cur_tag = 1;
    }
    std::priority_queue<Neighbor, std::vector<Neighbor>, NearCmp> cand;
    std::priority_queue<Neighbor, std::vector<Neighbor>, FarCmp> best;
    float d0 = dist(q, vec(start));
    cand.push({d0, start});
    best.push({d0, start});
    visit_tag[start] = cur_tag;
    while (!cand.empty()) {
      Neighbor c = cand.top();
      if (c.dist > best.top().dist && (int32_t)best.size() >= ef) break;
      cand.pop();
      int32_t cap;
      const int32_t* nb = links(c.id, level, &cap);
      int32_t cnt = link_count(c.id, level);
      for (int32_t t = 0; t < cnt; ++t) {
        int32_t v = nb[t];
        if (visit_tag[v] == cur_tag) continue;
        visit_tag[v] = cur_tag;
        float d = dist(q, vec(v));
        if ((int32_t)best.size() < ef || d < best.top().dist) {
          cand.push({d, v});
          best.push({d, v});
          if ((int32_t)best.size() > ef) best.pop();
        }
      }
    }
    std::vector<Neighbor> out(best.size());
    for (size_t t = out.size(); t-- > 0;) {
      out[t] = best.top();
      best.pop();
    }
    return out;  // ascending by distance
  }

  // paper's select-neighbors heuristic (keeps diverse links)
  void select_heuristic(std::vector<Neighbor>& cand, int32_t m) {
    if ((int32_t)cand.size() <= m) return;
    std::vector<Neighbor> kept;
    kept.reserve(m);
    for (const Neighbor& c : cand) {
      if ((int32_t)kept.size() >= m) break;
      bool ok = true;
      for (const Neighbor& k : kept) {
        if (dist(vec(c.id), vec(k.id)) < c.dist) {
          ok = false;  // closer to an already-kept neighbor than to q
          break;
        }
      }
      if (ok) kept.push_back(c);
    }
    // backfill with nearest remaining if the heuristic over-pruned
    for (const Neighbor& c : cand) {
      if ((int32_t)kept.size() >= m) break;
      bool dup = false;
      for (const Neighbor& k : kept) dup |= (k.id == c.id);
      if (!dup) kept.push_back(c);
    }
    cand.swap(kept);
  }

  void connect(int32_t a, int32_t b, int32_t level) {
    int32_t cap;
    int32_t* nb = links(a, level, &cap);
    int32_t& cnt = link_count(a, level);
    if (cnt < cap) {
      nb[cnt++] = b;
      return;
    }
    // over-full: re-select among existing + new by the heuristic
    std::vector<Neighbor> cand;
    cand.reserve(cnt + 1);
    const float* va = vec(a);
    cand.push_back({dist(va, vec(b)), b});
    for (int32_t t = 0; t < cnt; ++t)
      cand.push_back({dist(va, vec(nb[t])), nb[t]});
    std::sort(cand.begin(), cand.end(),
              [](const Neighbor& x, const Neighbor& y) { return x.dist < y.dist; });
    select_heuristic(cand, cap);
    cnt = (int32_t)cand.size();
    for (int32_t t = 0; t < cnt; ++t) nb[t] = cand[t].id;
  }

  void insert(int32_t i, std::mt19937_64& rng) {
    std::uniform_real_distribution<double> unif(0.0, 1.0);
    double u = std::max(unif(rng), 1e-12);
    int32_t level = (int32_t)(-std::log(u) * mult);
    level_of[i] = level;
    if (level > 0) {
      upper[i].assign((size_t)level * M, -1);
      n_upper[i].assign(level, 0);
    }
    if (entry < 0) {
      entry = i;
      max_level = level;
      return;
    }
    const float* q = vec(i);
    int32_t cur = entry;
    for (int32_t l = max_level; l > level; --l) cur = greedy(q, cur, l);
    for (int32_t l = std::min(level, max_level); l >= 0; --l) {
      std::vector<Neighbor> w = search_layer(q, cur, ef_construction, l);
      cur = w.front().id;
      int32_t m = (l == 0) ? M0 : M;
      std::vector<Neighbor> sel = w;
      select_heuristic(sel, std::min<int32_t>(m, M));
      int32_t cap;
      int32_t* nb = links(i, l, &cap);
      int32_t& cnt = link_count(i, l);
      for (const Neighbor& s : sel) {
        if (cnt < cap) nb[cnt++] = s.id;
        connect(s.id, i, l);
      }
    }
    if (level > max_level) {
      max_level = level;
      entry = i;
    }
  }
};

extern "C" {

HnswIndex* art_hnsw_build(const float* vectors, int64_t n, int32_t dim,
                          int32_t M, int32_t ef_construction,
                          uint64_t seed) {
  auto* idx = new HnswIndex();
  idx->n = n;
  idx->dim = dim;
  idx->M = M;
  idx->M0 = 2 * M;
  idx->ef_construction = ef_construction;
  idx->mult = 1.0 / std::log((double)M);
  idx->data.assign(vectors, vectors + (size_t)n * dim);
  idx->level_of.assign(n, 0);
  idx->links0.assign((size_t)n * idx->M0, -1);
  idx->n_links0.assign(n, 0);
  idx->upper.resize(n);
  idx->n_upper.resize(n);
  idx->visit_tag.assign(n, 0);
  std::mt19937_64 rng(seed);
  for (int64_t i = 0; i < n; ++i) idx->insert((int32_t)i, rng);
  return idx;
}

void art_hnsw_search(HnswIndex* idx, const float* queries, int64_t nq,
                     int32_t k, int32_t ef, int32_t* out_ids,
                     float* out_scores) {
  if (ef < k) ef = k;
  for (int64_t qi = 0; qi < nq; ++qi) {
    const float* q = queries + (size_t)qi * idx->dim;
    int32_t cur = idx->entry;
    for (int32_t l = idx->max_level; l > 0; --l) cur = idx->greedy(q, cur, l);
    std::vector<Neighbor> w = idx->search_layer(q, cur, ef, 0);
    for (int32_t j = 0; j < k; ++j) {
      if (j < (int32_t)w.size()) {
        out_ids[qi * k + j] = w[j].id;
        out_scores[qi * k + j] = -w[j].dist;  // back to inner product
      } else {
        out_ids[qi * k + j] = -1;
        out_scores[qi * k + j] = -1e30f;
      }
    }
  }
}

int64_t art_hnsw_memory_bytes(HnswIndex* idx) {
  // graph-only memory (excl. raw vectors), to support the equal-memory
  // accounting: vectors are counted separately by the caller
  int64_t b = (int64_t)idx->links0.size() * 4 + (int64_t)idx->n * 8;
  for (const auto& u : idx->upper) b += (int64_t)u.size() * 4;
  return b;
}

int32_t art_hnsw_max_level(HnswIndex* idx) { return idx->max_level; }

void art_hnsw_free(HnswIndex* idx) { delete idx; }

}  // extern "C"
