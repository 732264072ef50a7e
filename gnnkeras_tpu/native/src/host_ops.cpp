// Native host tier: C++ kernels for the host-side hot paths of the data
// pipeline (batch building and TU-format dataset parsing).
//
// The reference has no native code of any kind (SURVEY.md §2 "Native-code
// statement"); its host path is NumPy + scipy.  This tier is the new-build
// equivalent of a framework's native data loader/runtime: the device compute
// path is JAX/XLA/Pallas, and everything between disk and the padded device
// batch (scatter accumulations, label one-hots, text parsing) runs here as
// single-pass C++ over the raw buffers — no f64 temporaries, no np.add.at
// (which dispatches per element group through the ufunc machinery).
//
// ABI: plain extern "C" functions over raw pointers, loaded via ctypes
// (pybind11 is not available in this environment).  All array arguments are
// C-contiguous; the Python wrapper (gnnkeras_tpu/native/__init__.py) enforces
// dtype/contiguity and falls back to NumPy when the compiled library is
// unavailable.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// agg_arc[dst[e], :] += w[e] * arc_label[e, :]   (f64 accumulate, f32 out)
// agg_node[dst[e], :] += w[e] * nodes[src[e], :]
// One pass over the edges; replaces two np.add.at calls plus the f64
// astype copies of arc_label/nodes/w (the measured hotspot of
// graph/batch.py:from_graph_object).
void agg_label_sums(
    const int32_t* src, const int32_t* dst, const float* w, int64_t n_arcs,
    const float* arc_label, int64_t da,
    const float* nodes, int64_t dn,
    double* acc_arc,   // (N, da) zero-initialised by caller
    double* acc_node)  // (N, dn) zero-initialised by caller
{
    for (int64_t e = 0; e < n_arcs; ++e) {
        const double we = (double)w[e];
        // no zero-weight skip: 0*NaN must propagate exactly as np.add.at does
        double* oa = acc_arc + (int64_t)dst[e] * da;
        const float* la = arc_label + e * da;
        for (int64_t j = 0; j < da; ++j) oa[j] += we * (double)la[j];
        double* on = acc_node + (int64_t)dst[e] * dn;
        const float* ln = nodes + (int64_t)src[e] * dn;
        for (int64_t j = 0; j < dn; ++j) on[j] += we * (double)ln[j];
    }
}

// Composite per-type gated neighbor-label sums (reference
// CompositeGNN.py:251-253 semantics): for each type t,
//   acc[dst[e], off_t : off_t + d_t] += w[e] * nodes[src[e], :d_t]
// gated by the SOURCE node's type.  type_of[i] in [0, T); dims/offsets give
// each type's slice of the concatenated output (width sum(dims)).
void agg_component_sums(
    const int32_t* src, const int32_t* dst, const float* w, int64_t n_arcs,
    const float* nodes, int64_t dn,
    const int32_t* type_of,        // (N,) source-node type index
    const int64_t* dims,           // (T,) per-type label widths d_t
    const int64_t* offsets,        // (T,) column offset of each type's slice
    int64_t n_types,
    double* acc)                   // (N, sum(dims)) zero-initialised
{
    const int64_t width = offsets[n_types - 1] + dims[n_types - 1];
    for (int64_t e = 0; e < n_arcs; ++e) {
        const double we = (double)w[e];
        const int64_t s = (int64_t)src[e];
        const int32_t t = type_of[s];
        if (t < 0 || t >= n_types) continue;
        const int64_t d_t = dims[t];
        double* out = acc + (int64_t)dst[e] * width + offsets[t];
        const float* ln = nodes + s * dn;
        for (int64_t j = 0; j < d_t; ++j) out[j] += we * (double)ln[j];
    }
}

// Parse a whitespace/comma-separated integer text file (the TU dataset
// format: edge lists "a, b", label columns, graph indicators) into an int64
// buffer.  Returns the number of integers written, or -1 on open failure,
// -(2+offset) on a malformed byte.  Replaces np.loadtxt (which tokenises
// through Python) — ~20x on Mutagenicity_edges.txt.
int64_t parse_ints(const char* path, int64_t* out, int64_t capacity) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    const long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    char* buf = (char*)malloc((size_t)size + 1);
    if (!buf) { fclose(f); return -1; }
    const size_t got = fread(buf, 1, (size_t)size, f);
    fclose(f);
    buf[got] = '\0';
    int64_t count = 0;
    const char* p = buf;
    const char* end = buf + got;
    while (p < end) {
        // skip separators (whitespace, commas)
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r' || *p == ',')) ++p;
        if (p >= end) break;
        bool neg = false;
        if (*p == '-') { neg = true; ++p; }
        else if (*p == '+') ++p;
        if (p >= end || *p < '0' || *p > '9') { free(buf); return -(2 + (int64_t)(p - buf)); }
        int64_t v = 0;
        while (p < end && *p >= '0' && *p <= '9') { v = v * 10 + (*p - '0'); ++p; }
        if (count >= capacity) { free(buf); return -1; }
        out[count++] = neg ? -v : v;
    }
    free(buf);
    return count;
}

// np.add.at(out_flat, idx, w) over a float32 buffer: NumPy resolves the
// mixed f32/f64 ufunc loop to float64 and casts each result back, i.e.
// out[i] = float(double(out[i]) + w[e]) — for all-f32 inputs the double
// intermediate is still bit-identical (an f32 sum is exact in double and
// the final downcast is the one correctly-rounded step).  Replaces the
// buffered fancy-indexing add.at in the block/strip operator builders
// (ops/{strip,banded,bcsr}.py) — the hot host path of large-graph batch
// construction.
void scatter_add_f32(const int64_t* idx, const double* w, int64_t n, float* out) {
    for (int64_t e = 0; e < n; ++e) {
        float* o = out + idx[e];
        *o = (float)((double)*o + w[e]);
    }
}

// Factor arr (B, R, C) f64 as mask(int8) * scale[b, c]: every column's
// nonzeros must share one exact value (the per-destination aggregation
// weight, reference graph_class.py:105-121).  Single pass — replaces the
// NumPy argmax + full reconstruct-compare (three extra full-array sweeps).
// Returns 1 and fills mask (B*R*C int8) + scale (B*C f32) on success, 0
// when not factorable (mask/scale contents then undefined).
}  // extern "C" (template below cannot carry C linkage)

template <typename T>
static int32_t factor_mask_scale_impl(
    const T* arr, int64_t B, int64_t R, int64_t C,
    int8_t* mask, float* scale) {
    double* col_val = (double*)malloc(sizeof(double) * (size_t)C);
    bool* seen = (bool*)malloc(sizeof(bool) * (size_t)C);
    if (!col_val || !seen) { free(col_val); free(seen); return 0; }
    for (int64_t b = 0; b < B; ++b) {
        for (int64_t c = 0; c < C; ++c) seen[c] = false;
        const T* slab = arr + b * R * C;
        int8_t* mslab = mask + b * R * C;
        for (int64_t r = 0; r < R; ++r) {
            const T* row = slab + r * C;
            int8_t* mrow = mslab + r * C;
            for (int64_t c = 0; c < C; ++c) {
                const double a = (double)row[c];
                if (a != 0.0) {
                    // NaN: NumPy's reconstruct-compare (array_equal) always
                    // fails on NaN, so declare unfactorable for parity
                    if (a != a) { free(col_val); free(seen); return 0; }
                    mrow[c] = 1;
                    if (!seen[c]) { seen[c] = true; col_val[c] = a; }
                    else if (a != col_val[c]) { free(col_val); free(seen); return 0; }
                } else {
                    mrow[c] = 0;
                }
            }
        }
        float* srow = scale + b * C;
        for (int64_t c = 0; c < C; ++c) srow[c] = seen[c] ? (float)col_val[c] : 0.0f;
    }
    free(col_val);
    free(seen);
    return 1;
}

extern "C" {

int32_t factor_mask_scale(
    const double* arr, int64_t B, int64_t R, int64_t C, int8_t* mask, float* scale) {
    return factor_mask_scale_impl<double>(arr, B, R, C, mask, scale);
}

int32_t factor_mask_scale_f32(
    const float* arr, int64_t B, int64_t R, int64_t C, int8_t* mask, float* scale) {
    return factor_mask_scale_impl<float>(arr, B, R, C, mask, scale);
}

// Count integers in a file without storing them (sizing pass for parse_ints).
int64_t count_ints(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    const long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    char* buf = (char*)malloc((size_t)size + 1);
    if (!buf) { fclose(f); return -1; }
    const size_t got = fread(buf, 1, (size_t)size, f);
    fclose(f);
    buf[got] = '\0';
    int64_t count = 0;
    bool in_tok = false;
    for (size_t i = 0; i < got; ++i) {
        const char c = buf[i];
        const bool sep = (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == ',');
        if (!sep && !in_tok) { ++count; in_tok = true; }
        else if (sep) in_tok = false;
    }
    free(buf);
    return count;
}

}  // extern "C"
