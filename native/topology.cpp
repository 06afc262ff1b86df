// Native topology engine: the merge/numbering core of the mesh builder.
//
// Role parity: the reference generates its parallel topology offline with a
// native-toolchain generator (scr/Setup.py + scr/Proc2.py writing index files
// read by src/Topo.cpp).  Here the equivalent graph-building step -- merging
// geometrically coincident DOF slots into a global numbering -- runs in-process
// through this C++ kernel (sort-based, O(N log N)), exposed via ctypes with a
// pure-numpy fallback (mimsem_tpu/native.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Merge rows of quantized integer coordinate keys.
//   keys     : n x 3 int64 row-major
//   gid_out  : n int32, global id per row (ids ordered by first occurrence)
//   first_out: capacity n int64; first-occurrence row index per id
// Returns the number of unique ids.
long long merge_rows(long long n, const int64_t* keys, int32_t* gid_out,
                     int64_t* first_out) {
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    auto less = [keys](int64_t a, int64_t b) {
        const int64_t* ka = keys + 3 * a;
        const int64_t* kb = keys + 3 * b;
        if (ka[0] != kb[0]) return ka[0] < kb[0];
        if (ka[1] != kb[1]) return ka[1] < kb[1];
        return ka[2] < kb[2];
    };
    std::sort(order.begin(), order.end(), less);

    auto equal = [keys](int64_t a, int64_t b) {
        const int64_t* ka = keys + 3 * a;
        const int64_t* kb = keys + 3 * b;
        return ka[0] == kb[0] && ka[1] == kb[1] && ka[2] == kb[2];
    };

    // group identical keys; provisional id per sorted group, tracking the
    // minimal row index (the owner / first occurrence)
    std::vector<int32_t> prov(n);
    std::vector<int64_t> grp_min;
    int32_t g = -1;
    for (int64_t i = 0; i < n; ++i) {
        if (i == 0 || !equal(order[i], order[i - 1])) {
            ++g;
            grp_min.push_back(order[i]);
        } else if (order[i] < grp_min[g]) {
            grp_min[g] = order[i];
        }
        prov[order[i]] = g;
    }
    const int64_t nuniq = g + 1;

    // renumber ids by first-occurrence (owner) order for locality
    std::vector<int64_t> rank_order(nuniq);
    for (int64_t i = 0; i < nuniq; ++i) rank_order[i] = i;
    std::sort(rank_order.begin(), rank_order.end(),
              [&grp_min](int64_t a, int64_t b) { return grp_min[a] < grp_min[b]; });
    std::vector<int32_t> rank(nuniq);
    for (int64_t i = 0; i < nuniq; ++i) rank[rank_order[i]] = (int32_t)i;

    for (int64_t i = 0; i < n; ++i) gid_out[i] = rank[prov[i]];
    for (int64_t i = 0; i < nuniq; ++i) first_out[rank[i]] = grp_min[i];
    return nuniq;
}

// Inverse-table construction: for each destination d, list source positions
// (padded with n).  Used for scatter->gather-sum conversion.
//   dst   : n int64 destination ids in [0, n_dst)
//   table : n_dst x maxmult int64 output (padded with n)
// Returns max multiplicity used (table must be preallocated with maxmult cols).
long long inverse_table(long long n, long long n_dst, const int64_t* dst,
                        int64_t maxmult, int64_t* table) {
    std::vector<int64_t> count(n_dst, 0);
    for (int64_t i = 0; i < n_dst * maxmult; ++i) table[i] = n;
    int64_t used = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t d = dst[i];
        int64_t c = count[d]++;
        if (c < maxmult) table[d * maxmult + c] = i;
        if (count[d] > used) used = count[d];
    }
    return used;
}

}  // extern "C"
