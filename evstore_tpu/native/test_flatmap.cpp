// Brute-force differential test of FlatMap (the engine's open-addressing
// map) against std::unordered_map: random insert/erase/find mixes at small
// capacities so the backward-shift deletion path is exercised across wrap
// boundaries.  Built and run by tests/test_native.py under ASan+UBSan:
//   g++ -std=c++17 -g -fsanitize=address,undefined -DESV_FLATMAP_TEST \
//       -o t evstore_tpu/native/test_flatmap.cpp && ./t
#include "evstore_core.cpp"

#include <cassert>
#include <random>

int main() {
  std::mt19937_64 rng(12345);
  for (int trial = 0; trial < 200; trial++) {
    FlatMap<int64_t> fm;
    std::unordered_map<uint64_t, int64_t> ref;
    // small key universe forces collisions and dense tables
    uint64_t universe = 8 + rng() % 120;
    int n_ops = 2000;
    for (int op = 0; op < n_ops; op++) {
      uint64_t k = make_key((int)(rng() % 4), (int64_t)(rng() % universe));
      int kind = (int)(rng() % 3);
      if (kind == 0) {
        int64_t v = (int64_t)rng();
        fm.insert(k, v);
        ref[k] = v;
      } else if (kind == 1) {
        bool a = fm.erase(k);
        bool b = ref.erase(k) > 0;
        assert(a == b);
      } else {
        int64_t* p = fm.find(k);
        auto it = ref.find(k);
        assert((p != nullptr) == (it != ref.end()));
        if (p) assert(*p == it->second);
      }
      assert(fm.size() == ref.size());
    }
    // full-content check, both directions
    size_t seen = 0;
    fm.for_each([&](uint64_t k, int64_t v) {
      auto it = ref.find(k);
      assert(it != ref.end() && it->second == v);
      seen++;
    });
    assert(seen == ref.size());
    for (auto& kv : ref) {
      int64_t* p = fm.find(kv.first);
      assert(p && *p == kv.second);
    }
  }
  printf("FLATMAP-OK\n");
  return 0;
}
