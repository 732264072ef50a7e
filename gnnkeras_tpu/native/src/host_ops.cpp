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
