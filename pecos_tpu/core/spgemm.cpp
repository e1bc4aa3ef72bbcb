// Parallel sparse matmul Z = Y^T . X for PIFA label embeddings.
//
// Native equivalent of the reference's spmm_mat_t (pecos/core/utils/
// matrix.hpp:740, exposed as clib.sparse_matmul): at Wiki-500K scale the
// PIFA product Y^T X touches ~690M nonzeros and a single-threaded scipy
// product dominates index-build time.  Row l of Z is the Y-weighted sum of
// the X rows of label l's instances, accumulated into a generation-stamped
// dense scratch (the sdvec_t idiom) with OpenMP over labels.
//
// Shapes: Y csc (N x L) — column l lists label l's instances;
//         X csr (N x D) — row i lists instance i's features;
//         Z csr (L x D).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct SpgemmResult {
    std::vector<int64_t> indptr;  // L + 1
    std::vector<int32_t> indices;
    std::vector<float> data;
};

}  // namespace

extern "C" {

void* spgemm_atb(int64_t N, int64_t L, int64_t D,
                 const int64_t* y_indptr, const int32_t* y_indices, const float* y_data,
                 const int64_t* x_indptr, const int32_t* x_indices, const float* x_data,
                 int threads) {
    (void)N;
    int n_threads = 1;
#ifdef _OPENMP
    n_threads = threads > 0 ? threads : omp_get_max_threads();
#endif
    std::vector<SpgemmResult> parts(n_threads);
    std::vector<std::vector<int64_t>> row_nnz(n_threads);
    int64_t per = (L + n_threads - 1) / n_threads;

#ifdef _OPENMP
#pragma omp parallel for num_threads(n_threads) schedule(static, 1)
#endif
    for (int t = 0; t < n_threads; ++t) {
        std::vector<float> scratch(D, 0.0f);
        std::vector<uint32_t> stamp(D, 0);
        std::vector<int32_t> touched;
        uint32_t gen = 0;
        SpgemmResult& out = parts[t];
        int64_t l0 = t * per, l1 = std::min(L, (t + 1) * per);
        for (int64_t l = l0; l < l1; ++l) {
            ++gen;
            touched.clear();
            for (int64_t p = y_indptr[l]; p < y_indptr[l + 1]; ++p) {
                int64_t i = y_indices[p];
                float yv = y_data[p];
                for (int64_t q = x_indptr[i]; q < x_indptr[i + 1]; ++q) {
                    int32_t col = x_indices[q];
                    if (stamp[col] != gen) {
                        stamp[col] = gen;
                        scratch[col] = 0.0f;
                        touched.push_back(col);
                    }
                    scratch[col] += yv * x_data[q];
                }
            }
            // emit the row in sorted column order (canonical CSR)
            std::sort(touched.begin(), touched.end());
            for (int32_t col : touched) {
                out.indices.push_back(col);
                out.data.push_back(scratch[col]);
            }
            row_nnz[t].push_back((int64_t)touched.size());
        }
    }

    SpgemmResult* r = new SpgemmResult();
    size_t total = 0;
    for (auto& p : parts) total += p.indices.size();
    r->indices.reserve(total);
    r->data.reserve(total);
    r->indptr.reserve(L + 1);
    r->indptr.push_back(0);
    for (int t = 0; t < n_threads; ++t) {
        r->indices.insert(r->indices.end(), parts[t].indices.begin(), parts[t].indices.end());
        r->data.insert(r->data.end(), parts[t].data.begin(), parts[t].data.end());
        for (int64_t c : row_nnz[t]) r->indptr.push_back(r->indptr.back() + c);
    }
    return r;
}

int64_t spgemm_nnz(void* handle) { return (int64_t)((SpgemmResult*)handle)->indices.size(); }

void spgemm_fill(void* handle, int64_t* indptr, int32_t* indices, float* data) {
    SpgemmResult* r = (SpgemmResult*)handle;
    std::memcpy(indptr, r->indptr.data(), r->indptr.size() * sizeof(int64_t));
    if (!r->indices.empty()) {
        std::memcpy(indices, r->indices.data(), r->indices.size() * sizeof(int32_t));
        std::memcpy(data, r->data.data(), r->data.size() * sizeof(float));
    }
}

void spgemm_free(void* handle) { delete (SpgemmResult*)handle; }

}  // extern "C"
