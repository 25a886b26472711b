// Native CV evaluator: forward + analytic input Jacobian for the deployed
// collective-variable program (cv_native.bin, format CVNATV01 — see
// colvarsfinder_tpu/deploy_native.py for the layout).
//
// This is the engine-side deployment runtime: the counterpart of the
// reference consuming its TorchScript artifact through libtorch's C++ API
// from MD-engine plugins (reference: colvarsfinder/core.py:212-227). A
// plugin links this library, loads the artifact once, and calls
// cveval_eval_grad per MD step to get CV values and biasing forces —
// no Python/numpy/JAX/torch in the loop.
//
// All math is float64. The alignment backward uses the implicit derivative
// of the 4x4 quaternion eigenproblem (Horn's key matrix), mirroring the
// numpy reference implementation in colvarsfinder_tpu/deploy.py, which
// these kernels are tested against at 1e-12 (tests/test_native_cv.py).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// v1 programs are a strict payload subset of v2 (v2 adds switching-function
// parameters on feature types >= 6), so the loader accepts both magics.
constexpr char MAGIC_V1[8] = {'C', 'V', 'N', 'A', 'T', 'V', '0', '1'};
constexpr char MAGIC_V2[8] = {'C', 'V', 'N', 'A', 'T', 'V', '0', '2'};

struct Param {
    std::vector<int> dims;
    std::vector<double> data;
};

enum OpKind { OP_ALIGN = 0, OP_FEATURES = 1, OP_MLP = 2, OP_STACKED = 3 };
enum FType { F_POSITION = 0, F_BOND = 1, F_ANGLE = 2, F_ANGLE_RAD = 3,
             F_DIHEDRAL = 4, F_DIHEDRAL_RAD = 5, F_CONTACT = 6,
             F_COORDINATION = 7 };

struct Feature {
    int type;
    std::vector<int> idx;
    // RATIONAL switching parameters (contact / coordination only)
    double r0 = 0.0, d0 = 0.0;
    int nn = 6, mm = 12;
};

struct Op {
    int kind = 0;
    // alignment
    int ref_p = -1, w_p = -1;
    std::vector<int> aidx;
    // features
    std::vector<Feature> feats;
    // orthogonal minimum-image box for pair-distance features (v2)
    bool has_box = false;
    double box[3] = {0.0, 0.0, 0.0};
    // mlp / stacked_mlp
    int act = 0, k = 1;
    std::vector<std::pair<int, int>> layers;  // (w_param, b_param)
};

struct Model {
    int state_ndim = 1;
    std::vector<Param> params;
    std::vector<Op> ops;
    int n_out = -1;
};

int feature_width(const Feature& f) {
    switch (f.type) {
        case F_POSITION: return 3 * (int)f.idx.size();
        case F_DIHEDRAL: return 2;
        default: return 1;
    }
}

// RATIONAL switching s(r) = (1 - x^nn)/(1 - x^mm), x = max(0, (r-d0)/r0),
// with the removable x = 1 singularity evaluated by first-order series —
// mirrors colvarsfinder_tpu/deploy.py::_np_switch / _np_switch_dr exactly.
double sw_val(const Feature& f, double r) {
    double x = (r - f.d0) / f.r0;
    if (x < 0.0) x = 0.0;
    if (std::fabs(x - 1.0) < 1e-8)
        return (double)f.nn / f.mm
             + f.nn * (f.nn - f.mm) / (2.0 * f.mm) * (x - 1.0);
    double xn = std::pow(x, f.nn), xm = std::pow(x, f.mm);
    return (1.0 - xn) / (1.0 - xm);
}

double sw_dr(const Feature& f, double r) {
    if (r - f.d0 <= 0.0) return 0.0;
    double x = (r - f.d0) / f.r0;
    double ds;
    if (std::fabs(x - 1.0) < 1e-8) {
        ds = f.nn * (f.nn - f.mm) / (2.0 * f.mm);
    } else {
        double xn1 = std::pow(x, f.nn - 1), xm1 = std::pow(x, f.mm - 1);
        double den = 1.0 - xm1 * x;
        ds = (-f.nn * xn1 * den + f.mm * xm1 * (1.0 - xn1 * x)) / (den * den);
    }
    return ds / f.r0;
}

// ---------------------------------------------------------------------------
// activations
// ---------------------------------------------------------------------------

double act_f(int a, double z) {
    switch (a) {
        case 0: return std::tanh(z);
        case 1: return z > 0 ? z : 0.0;
        case 2: return z > 0 ? z : std::expm1(z);               // elu
        case 3: {                                               // gelu (tanh)
            const double c = std::sqrt(2.0 / M_PI), k3 = 0.044715;
            return 0.5 * z * (1.0 + std::tanh(c * (z + k3 * z * z * z)));
        }
        case 4: return 1.0 / (1.0 + std::exp(-z));              // sigmoid
        case 5: return z > 30 ? z : std::log1p(std::exp(z));    // softplus
        case 6: return z > 0 ? z : std::expm1(z);               // celu
        default: return z;                                      // identity
    }
}

double act_g(int a, double z) {
    switch (a) {
        case 0: { double t = std::tanh(z); return 1.0 - t * t; }
        case 1: return z > 0 ? 1.0 : 0.0;
        case 2: return z > 0 ? 1.0 : std::exp(z);
        case 3: {
            const double c = std::sqrt(2.0 / M_PI), k3 = 0.044715;
            double u = c * (z + k3 * z * z * z);
            double t = std::tanh(u);
            return 0.5 * (1.0 + t)
                 + 0.5 * z * (1.0 - t * t) * c * (1.0 + 3.0 * k3 * z * z);
        }
        case 4: { double s = 1.0 / (1.0 + std::exp(-z)); return s * (1 - s); }
        case 5: return 1.0 / (1.0 + std::exp(-z));
        case 6: return z > 0 ? 1.0 : std::exp(z);
        default: return 1.0;
    }
}

// ---------------------------------------------------------------------------
// small vector helpers
// ---------------------------------------------------------------------------

inline void mic3(double* d, const Op& op) {
    if (!op.has_box) return;
    for (int k = 0; k < 3; k++)
        d[k] -= op.box[k] * std::round(d[k] / op.box[k]);
}

inline void cross(const double* a, const double* b, double* o) {
    o[0] = a[1] * b[2] - a[2] * b[1];
    o[1] = a[2] * b[0] - a[0] * b[2];
    o[2] = a[0] * b[1] - a[1] * b[0];
}
inline double dot3(const double* a, const double* b) {
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
}
inline double norm3(const double* a) { return std::sqrt(dot3(a, a)); }

// Cyclic Jacobi eigensolver for a symmetric 4x4; eigenvalues ascending,
// V's columns are the eigenvectors (V[r*4+c] = component r of eigvec c).
void jacobi4(const double A_in[16], double evals[4], double V[16]) {
    double A[16];
    std::memcpy(A, A_in, sizeof(A));
    for (int i = 0; i < 16; i++) V[i] = 0.0;
    for (int i = 0; i < 4; i++) V[i * 4 + i] = 1.0;
    for (int sweep = 0; sweep < 64; sweep++) {
        double off = 0.0;
        for (int p = 0; p < 4; p++)
            for (int q = p + 1; q < 4; q++) off += A[p * 4 + q] * A[p * 4 + q];
        if (off < 1e-28) break;
        for (int p = 0; p < 4; p++) {
            for (int q = p + 1; q < 4; q++) {
                double apq = A[p * 4 + q];
                if (std::fabs(apq) < 1e-300) continue;
                double theta = (A[q * 4 + q] - A[p * 4 + p]) / (2.0 * apq);
                double t = (theta >= 0 ? 1.0 : -1.0)
                         / (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
                double c = 1.0 / std::sqrt(t * t + 1.0), s = t * c;
                for (int r = 0; r < 4; r++) {
                    double arp = A[r * 4 + p], arq = A[r * 4 + q];
                    A[r * 4 + p] = c * arp - s * arq;
                    A[r * 4 + q] = s * arp + c * arq;
                }
                for (int r = 0; r < 4; r++) {
                    double apr = A[p * 4 + r], aqr = A[q * 4 + r];
                    A[p * 4 + r] = c * apr - s * aqr;
                    A[q * 4 + r] = s * apr + c * aqr;
                }
                for (int r = 0; r < 4; r++) {
                    double vrp = V[r * 4 + p], vrq = V[r * 4 + q];
                    V[r * 4 + p] = c * vrp - s * vrq;
                    V[r * 4 + q] = s * vrp + c * vrq;
                }
            }
        }
    }
    int order[4] = {0, 1, 2, 3};
    double d[4] = {A[0], A[5], A[10], A[15]};
    for (int i = 0; i < 4; i++)
        for (int j = i + 1; j < 4; j++)
            if (d[order[j]] < d[order[i]]) { int t = order[i]; order[i] = order[j]; order[j] = t; }
    double Vs[16];
    for (int c = 0; c < 4; c++) {
        evals[c] = d[order[c]];
        for (int r = 0; r < 4; r++) Vs[r * 4 + c] = V[r * 4 + order[c]];
    }
    std::memcpy(V, Vs, sizeof(Vs));
}

// ---------------------------------------------------------------------------
// per-op tape contexts (one frame at a time)
// ---------------------------------------------------------------------------

struct AlignCtx {
    int N = 0, m = 0;
    std::vector<double> xc;    // [N*3] centered input
    std::vector<double> refc;  // [m*3] (re-)centered reference
    std::vector<double> wn;    // [m] centroid weights (sum 1)
    std::vector<double> wraw;  // [m] raw Kabsch weights (empty: unweighted)
    double R[9], q[4], evals[4], evecs[16];
    bool ok = true;
};

struct FeatCtx {
    std::vector<double> in;  // input coords [N*3]
    int N = 0;
};

struct MlpCtx {
    std::vector<std::vector<double>> zs;  // pre-activations per layer
    std::vector<double> in;
};

struct Tape {
    std::vector<AlignCtx> align;
    std::vector<FeatCtx> feat;
    std::vector<MlpCtx> mlp;   // used by both MLP and STACKED (zs laid out [k][o])
    std::vector<int> ctx_of;   // per op: index into its kind's ctx vector
};

// ---------------------------------------------------------------------------
// forward
// ---------------------------------------------------------------------------

int forward_align(const Model& M, const Op& op, const std::vector<double>& x,
                  std::vector<double>& out, AlignCtx& ctx) {
    int N = (int)(x.size() / 3);
    int m = (int)op.aidx.size();
    ctx.N = N;
    ctx.m = m;
    const Param& ref = M.params[op.ref_p];
    const double* w = op.w_p >= 0 ? M.params[op.w_p].data.data() : nullptr;
    ctx.wn.assign(m, 1.0 / m);
    ctx.wraw.clear();
    if (w) {
        ctx.wraw.assign(w, w + m);
        double sw = 0.0;
        for (int i = 0; i < m; i++) sw += w[i];
        for (int i = 0; i < m; i++) ctx.wn[i] = w[i] / sw;
    }
    // (re-)centered reference
    ctx.refc.assign(ref.data.begin(), ref.data.end());
    if (w) {
        double rc[3] = {0, 0, 0};
        for (int i = 0; i < m; i++)
            for (int d = 0; d < 3; d++) rc[d] += ctx.wn[i] * ctx.refc[i * 3 + d];
        for (int i = 0; i < m; i++)
            for (int d = 0; d < 3; d++) ctx.refc[i * 3 + d] -= rc[d];
    }
    double com[3] = {0, 0, 0};
    for (int i = 0; i < m; i++) {
        const double* xi = &x[op.aidx[i] * 3];
        for (int d = 0; d < 3; d++) com[d] += ctx.wn[i] * xi[d];
    }
    ctx.xc.resize(N * 3);
    for (int n = 0; n < N; n++)
        for (int d = 0; d < 3; d++) ctx.xc[n * 3 + d] = x[n * 3 + d] - com[d];
    // weighted centered selection and cross-covariance C = sel_c^T refc
    double C[9] = {0};
    for (int i = 0; i < m; i++) {
        double s[3];
        for (int d = 0; d < 3; d++) {
            s[d] = x[op.aidx[i] * 3 + d] - com[d];
            if (w) s[d] *= w[i];
        }
        for (int a = 0; a < 3; a++)
            for (int b = 0; b < 3; b++) C[a * 3 + b] += s[a] * ctx.refc[i * 3 + b];
    }
    double nC = 0.0;
    for (int i = 0; i < 9; i++) nC += C[i] * C[i];
    ctx.ok = std::sqrt(nC) > 1e-12;
    if (!ctx.ok) {
        for (int i = 0; i < 9; i++) ctx.R[i] = (i % 4 == 0) ? 1.0 : 0.0;
    } else {
        // Horn's 4x4 key matrix
        double K[16];
        double sxx = C[0], sxy = C[1], sxz = C[2];
        double syx = C[3], syy = C[4], syz = C[5];
        double szx = C[6], szy = C[7], szz = C[8];
        K[0] = sxx + syy + szz;
        K[1] = K[4] = syz - szy;
        K[2] = K[8] = szx - sxz;
        K[3] = K[12] = sxy - syx;
        K[5] = sxx - syy - szz;
        K[6] = K[9] = sxy + syx;
        K[7] = K[13] = szx + sxz;
        K[10] = syy - sxx - szz;
        K[11] = K[14] = syz + szy;
        K[15] = szz - sxx - syy;
        jacobi4(K, ctx.evals, ctx.evecs);
        for (int r = 0; r < 4; r++) ctx.q[r] = ctx.evecs[r * 4 + 3];
        double qw = ctx.q[0], qx = ctx.q[1], qy = ctx.q[2], qz = ctx.q[3];
        ctx.R[0] = 1 - 2 * (qy * qy + qz * qz);
        ctx.R[1] = 2 * (qx * qy + qw * qz);
        ctx.R[2] = 2 * (qx * qz - qw * qy);
        ctx.R[3] = 2 * (qx * qy - qw * qz);
        ctx.R[4] = 1 - 2 * (qx * qx + qz * qz);
        ctx.R[5] = 2 * (qy * qz + qw * qx);
        ctx.R[6] = 2 * (qx * qz + qw * qy);
        ctx.R[7] = 2 * (qy * qz - qw * qx);
        ctx.R[8] = 1 - 2 * (qx * qx + qy * qy);
    }
    out.resize(N * 3);
    for (int n = 0; n < N; n++)
        for (int j = 0; j < 3; j++) {
            double v = 0.0;
            for (int i = 0; i < 3; i++) v += ctx.xc[n * 3 + i] * ctx.R[i * 3 + j];
            out[n * 3 + j] = v;
        }
    return 0;
}

void forward_features(const Op& op, const std::vector<double>& x,
                      std::vector<double>& out, FeatCtx& ctx) {
    ctx.in = x;
    ctx.N = (int)(x.size() / 3);
    out.clear();
    for (const Feature& f : op.feats) {
        const double* a = f.idx.size() > 0 ? &x[f.idx[0] * 3] : nullptr;
        switch (f.type) {
            case F_POSITION:
                for (int i : f.idx)
                    for (int d = 0; d < 3; d++) out.push_back(x[i * 3 + d]);
                break;
            case F_BOND: {
                const double* b = &x[f.idx[1] * 3];
                double dvec[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
                mic3(dvec, op);
                out.push_back(norm3(dvec));
                break;
            }
            case F_CONTACT: case F_COORDINATION: {
                double total = 0.0;
                for (size_t u = 0; u + 1 < f.idx.size(); u += 2) {
                    const double* pa = &x[f.idx[u] * 3];
                    const double* pb = &x[f.idx[u + 1] * 3];
                    double dvec[3] = {pb[0] - pa[0], pb[1] - pa[1],
                                      pb[2] - pa[2]};
                    mic3(dvec, op);
                    total += sw_val(f, norm3(dvec));
                }
                out.push_back(total);
                break;
            }
            case F_ANGLE: case F_ANGLE_RAD: {
                const double* b = &x[f.idx[1] * 3];
                const double* c = &x[f.idx[2] * 3];
                double u[3] = {a[0] - b[0], a[1] - b[1], a[2] - b[2]};
                double v[3] = {c[0] - b[0], c[1] - b[1], c[2] - b[2]};
                if (f.type == F_ANGLE) {
                    out.push_back(dot3(u, v) / (norm3(u) * norm3(v)));
                } else {
                    double w[3];
                    cross(u, v, w);
                    out.push_back(std::atan2(norm3(w), dot3(u, v)));
                }
                break;
            }
            default: {  // dihedral / dihedral_rad
                const double* b = &x[f.idx[1] * 3];
                const double* c = &x[f.idx[2] * 3];
                const double* dd = &x[f.idx[3] * 3];
                double b1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
                double b2[3] = {c[0] - b[0], c[1] - b[1], c[2] - b[2]};
                double b3[3] = {dd[0] - c[0], dd[1] - c[1], dd[2] - c[2]};
                double n1[3], n2[3], b2h[3], m1[3];
                cross(b1, b2, n1);
                cross(b2, b3, n2);
                double nb2 = norm3(b2);
                for (int d = 0; d < 3; d++) b2h[d] = b2[d] / nb2;
                cross(n1, b2h, m1);
                double ct = dot3(n1, n2), st = dot3(m1, n2);
                if (f.type == F_DIHEDRAL) {
                    double nrm = std::sqrt(ct * ct + st * st);
                    out.push_back(ct / nrm);
                    out.push_back(st / nrm);
                } else {
                    out.push_back(std::atan2(st, ct));
                }
            }
        }
    }
}

int forward_mlp(const Model& M, const Op& op, const std::vector<double>& x,
                std::vector<double>& out, MlpCtx& ctx) {
    ctx.in = x;
    ctx.zs.clear();
    int nl = (int)op.layers.size();
    std::vector<double> h = x;
    for (int l = 0; l < nl; l++) {
        const Param& W = M.params[op.layers[l].first];
        const Param& B = M.params[op.layers[l].second];
        int o = W.dims[0], in = W.dims[1];
        if ((int)h.size() != in) return 2;
        std::vector<double> z(o);
        for (int r = 0; r < o; r++) {
            double v = B.data[r];
            const double* wr = &W.data[(size_t)r * in];
            for (int cc = 0; cc < in; cc++) v += wr[cc] * h[cc];
            z[r] = v;
        }
        ctx.zs.push_back(z);
        if (l < nl - 1)
            for (int r = 0; r < o; r++) z[r] = act_f(op.act, z[r]);
        h = std::move(z);
    }
    out = std::move(h);
    return 0;
}

int forward_stacked(const Model& M, const Op& op, const std::vector<double>& x,
                    std::vector<double>& out, MlpCtx& ctx) {
    ctx.in = x;
    ctx.zs.clear();
    int nl = (int)op.layers.size(), k = op.k;
    // h laid out [k][width]
    std::vector<double> h(k * x.size());
    for (int kk = 0; kk < k; kk++)
        std::copy(x.begin(), x.end(), h.begin() + (size_t)kk * x.size());
    int width = (int)x.size();
    for (int l = 0; l < nl; l++) {
        const Param& W = M.params[op.layers[l].first];  // [k, o, in]
        const Param& B = M.params[op.layers[l].second]; // [k, o]
        int o = W.dims[1], in = W.dims[2];
        if (width != in) return 2;
        std::vector<double> z((size_t)k * o);
        for (int kk = 0; kk < k; kk++) {
            const double* hk = &h[(size_t)kk * in];
            for (int r = 0; r < o; r++) {
                double v = B.data[(size_t)kk * o + r];
                const double* wr = &W.data[((size_t)kk * o + r) * in];
                for (int cc = 0; cc < in; cc++) v += wr[cc] * hk[cc];
                z[(size_t)kk * o + r] = v;
            }
        }
        ctx.zs.push_back(z);
        if (l < nl - 1)
            for (size_t i = 0; i < z.size(); i++) z[i] = act_f(op.act, z[i]);
        h = std::move(z);
        width = o;
    }
    // output: [k, o] -> interleave to [k*o] in (head-major then unit) order
    // matching numpy's transpose(1,0,2).reshape: component index = kk*o + r
    out = std::move(h);
    return 0;
}

// ---------------------------------------------------------------------------
// backward (K cotangent rows at once; g laid out [K][dim])
// ---------------------------------------------------------------------------

void backward_mlp(const Model& M, const Op& op, const MlpCtx& ctx, int K,
                  std::vector<double>& g) {
    int nl = (int)op.layers.size();
    for (int l = nl - 1; l >= 0; l--) {
        const Param& W = M.params[op.layers[l].first];
        int o = W.dims[0], in = W.dims[1];
        if (l < nl - 1)
            for (int r = 0; r < K; r++)
                for (int cc = 0; cc < o; cc++)
                    g[(size_t)r * o + cc] *= act_g(op.act, ctx.zs[l][cc]);
        std::vector<double> gi((size_t)K * in, 0.0);
        for (int r = 0; r < K; r++)
            for (int oo = 0; oo < o; oo++) {
                double gv = g[(size_t)r * o + oo];
                if (gv == 0.0) continue;
                const double* wr = &W.data[(size_t)oo * in];
                double* girow = &gi[(size_t)r * in];
                for (int cc = 0; cc < in; cc++) girow[cc] += gv * wr[cc];
            }
        g = std::move(gi);
    }
}

void backward_stacked(const Model& M, const Op& op, const MlpCtx& ctx, int K,
                      std::vector<double>& g) {
    int nl = (int)op.layers.size(), k = op.k;
    // g arrives as [K][k*o_last]; per-head cotangent layout matches forward
    int o = M.params[op.layers[nl - 1].first].dims[1];
    // gh laid out [K][k][o]
    std::vector<double> gh = g;
    int width = o;
    for (int l = nl - 1; l >= 0; l--) {
        const Param& W = M.params[op.layers[l].first];
        int oo = W.dims[1], in = W.dims[2];
        if (l < nl - 1)
            for (int r = 0; r < K; r++)
                for (int kk = 0; kk < k; kk++)
                    for (int cc = 0; cc < oo; cc++)
                        gh[((size_t)r * k + kk) * oo + cc]
                            *= act_g(op.act, ctx.zs[l][(size_t)kk * oo + cc]);
        std::vector<double> gi((size_t)K * k * in, 0.0);
        for (int r = 0; r < K; r++)
            for (int kk = 0; kk < k; kk++) {
                const double* gr = &gh[((size_t)r * k + kk) * oo];
                double* girow = &gi[((size_t)r * k + kk) * in];
                for (int u = 0; u < oo; u++) {
                    double gv = gr[u];
                    if (gv == 0.0) continue;
                    const double* wr = &W.data[((size_t)kk * oo + u) * in];
                    for (int cc = 0; cc < in; cc++) girow[cc] += gv * wr[cc];
                }
            }
        gh = std::move(gi);
        width = in;
    }
    // sum over heads -> [K][in]
    g.assign((size_t)K * width, 0.0);
    for (int r = 0; r < K; r++)
        for (int kk = 0; kk < k; kk++)
            for (int cc = 0; cc < width; cc++)
                g[(size_t)r * width + cc] += gh[((size_t)r * k + kk) * width + cc];
}

void backward_features(const Op& op, const FeatCtx& ctx, int K,
                       std::vector<double>& g) {
    const std::vector<double>& x = ctx.in;
    int N = ctx.N;
    std::vector<double> acc((size_t)K * N * 3, 0.0);
    int total_w = 0;
    for (const Feature& f : op.feats) total_w += feature_width(f);
    int off = 0;
    for (const Feature& f : op.feats) {
        int w = feature_width(f);
        const double* a = f.idx.size() > 0 ? &x[f.idx[0] * 3] : nullptr;
        for (int r = 0; r < K; r++) {
            const double* gr = &g[(size_t)r * total_w + off];
            double* ar = &acc[(size_t)r * N * 3];
            switch (f.type) {
                case F_POSITION: {
                    for (size_t i = 0; i < f.idx.size(); i++)
                        for (int d = 0; d < 3; d++)
                            ar[f.idx[i] * 3 + d] += gr[i * 3 + d];
                    break;
                }
                case F_BOND: {
                    const double* b = &x[f.idx[1] * 3];
                    double dv[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
                    mic3(dv, op);
                    double rn = norm3(dv);
                    for (int d = 0; d < 3; d++) {
                        double gu = gr[0] * dv[d] / rn;
                        ar[f.idx[0] * 3 + d] -= gu;
                        ar[f.idx[1] * 3 + d] += gu;
                    }
                    break;
                }
                case F_CONTACT: case F_COORDINATION: {
                    for (size_t u = 0; u + 1 < f.idx.size(); u += 2) {
                        const double* pa = &x[f.idx[u] * 3];
                        const double* pb = &x[f.idx[u + 1] * 3];
                        double dv[3] = {pb[0] - pa[0], pb[1] - pa[1],
                                        pb[2] - pa[2]};
                        mic3(dv, op);
                        double rn = norm3(dv);
                        double coef = gr[0] * sw_dr(f, rn) / rn;
                        for (int d = 0; d < 3; d++) {
                            double gu = coef * dv[d];
                            ar[f.idx[u] * 3 + d] -= gu;
                            ar[f.idx[u + 1] * 3 + d] += gu;
                        }
                    }
                    break;
                }
                case F_ANGLE: case F_ANGLE_RAD: {
                    const double* b = &x[f.idx[1] * 3];
                    const double* c = &x[f.idx[2] * 3];
                    double u[3] = {a[0] - b[0], a[1] - b[1], a[2] - b[2]};
                    double v[3] = {c[0] - b[0], c[1] - b[1], c[2] - b[2]};
                    double nu = norm3(u), nv = norm3(v), dp = dot3(u, v);
                    double du[3], dv2[3];
                    if (f.type == F_ANGLE) {
                        double ct = dp / (nu * nv);
                        for (int d = 0; d < 3; d++) {
                            du[d] = v[d] / (nu * nv) - ct * u[d] / (nu * nu);
                            dv2[d] = u[d] / (nu * nv) - ct * v[d] / (nv * nv);
                        }
                    } else {
                        double w3[3], wh[3];
                        cross(u, v, w3);
                        double s = norm3(w3);
                        double sg = s > 1e-30 ? s : 1e-30;
                        for (int d = 0; d < 3; d++) wh[d] = w3[d] / sg;
                        double n2 = s * s + dp * dp;
                        double cs = dp / n2, ss = s / n2;
                        double vxw[3], wxu[3];
                        cross(v, wh, vxw);
                        cross(wh, u, wxu);
                        for (int d = 0; d < 3; d++) {
                            du[d] = cs * vxw[d] - ss * v[d];
                            dv2[d] = cs * wxu[d] - ss * u[d];
                        }
                    }
                    for (int d = 0; d < 3; d++) {
                        double ga = gr[0] * du[d], gc = gr[0] * dv2[d];
                        ar[f.idx[0] * 3 + d] += ga;
                        ar[f.idx[2] * 3 + d] += gc;
                        ar[f.idx[1] * 3 + d] -= ga + gc;
                    }
                    break;
                }
                default: {  // dihedral / dihedral_rad
                    const double* b = &x[f.idx[1] * 3];
                    const double* c = &x[f.idx[2] * 3];
                    const double* dd = &x[f.idx[3] * 3];
                    double b1[3] = {b[0] - a[0], b[1] - a[1], b[2] - a[2]};
                    double b2[3] = {c[0] - b[0], c[1] - b[1], c[2] - b[2]};
                    double b3[3] = {dd[0] - c[0], dd[1] - c[1], dd[2] - c[2]};
                    double n1[3], n2[3], b2h[3], m1[3];
                    cross(b1, b2, n1);
                    cross(b2, b3, n2);
                    double nb2 = norm3(b2);
                    for (int d = 0; d < 3; d++) b2h[d] = b2[d] / nb2;
                    cross(n1, b2h, m1);
                    double ct = dot3(n1, n2), st = dot3(m1, n2);
                    double n2rm = ct * ct + st * st;
                    double g_phi;
                    if (f.type == F_DIHEDRAL) {
                        double nrm = std::sqrt(n2rm);
                        double cp = ct / nrm, sp = st / nrm;
                        g_phi = -gr[0] * sp + gr[1] * cp;
                    } else {
                        g_phi = gr[0];
                    }
                    double a_st = g_phi * ct / n2rm, a_ct = -g_phi * st / n2rm;
                    double dct1[3], dct2[3], dct3[3];
                    double t1[3], t2[3];
                    cross(b2, n2, dct1);
                    cross(n2, b1, t1);
                    cross(b3, n1, t2);
                    for (int d = 0; d < 3; d++) dct2[d] = t1[d] + t2[d];
                    cross(n1, b2, dct3);
                    double bxn[3], proj[3], dst1[3], dst2[3], dst3[3];
                    cross(b2h, n2, bxn);
                    double n2xn1[3];
                    cross(n2, n1, n2xn1);
                    double pd = dot3(n2xn1, b2h);
                    for (int d = 0; d < 3; d++)
                        proj[d] = (n2xn1[d] - b2h[d] * pd) / nb2;
                    cross(b2, bxn, dst1);
                    double u1[3], u2[3];
                    cross(bxn, b1, u1);
                    cross(b3, m1, u2);
                    for (int d = 0; d < 3; d++)
                        dst2[d] = u1[d] + proj[d] + u2[d];
                    cross(m1, b2, dst3);
                    for (int d = 0; d < 3; d++) {
                        double g1 = a_ct * dct1[d] + a_st * dst1[d];
                        double g2 = a_ct * dct2[d] + a_st * dst2[d];
                        double g3 = a_ct * dct3[d] + a_st * dst3[d];
                        ar[f.idx[0] * 3 + d] -= g1;
                        ar[f.idx[1] * 3 + d] += g1 - g2;
                        ar[f.idx[2] * 3 + d] += g2 - g3;
                        ar[f.idx[3] * 3 + d] += g3;
                    }
                }
            }
        }
        off += w;
    }
    g = std::move(acc);
}

void backward_align(const Op& op, const AlignCtx& ctx, int K,
                    std::vector<double>& g) {
    int N = ctx.N, m = ctx.m;
    std::vector<double> gx((size_t)K * N * 3, 0.0);
    for (int r = 0; r < K; r++) {
        const double* gr = &g[(size_t)r * N * 3];
        double* gxr = &gx[(size_t)r * N * 3];
        // g_xc = g @ R^T ; g_R = xc^T g
        double gR[9] = {0};
        std::vector<double> gxc((size_t)N * 3);
        for (int n = 0; n < N; n++) {
            for (int i = 0; i < 3; i++) {
                double v = 0.0;
                for (int j = 0; j < 3; j++) v += gr[n * 3 + j] * ctx.R[i * 3 + j];
                gxc[n * 3 + i] = v;
            }
            for (int i = 0; i < 3; i++)
                for (int j = 0; j < 3; j++)
                    gR[i * 3 + j] += ctx.xc[n * 3 + i] * gr[n * 3 + j];
        }
        double gC[9] = {0};
        if (ctx.ok) {
            // R entries -> quaternion (linear-in-q Jacobian of the
            // quadratic map), then implicit top-eigenpair backward
            double qw = ctx.q[0], qx = ctx.q[1], qy = ctx.q[2], qz = ctx.q[3];
            double J[9][4] = {
                {0, 0, -4 * qy, -4 * qz},
                {2 * qz, 2 * qy, 2 * qx, 2 * qw},
                {-2 * qy, 2 * qz, -2 * qw, 2 * qx},
                {-2 * qz, 2 * qy, 2 * qx, -2 * qw},
                {0, -4 * qx, 0, -4 * qz},
                {2 * qx, 2 * qw, 2 * qz, 2 * qy},
                {2 * qy, 2 * qz, 2 * qw, 2 * qx},
                {-2 * qx, -2 * qw, 2 * qz, 2 * qy},
                {0, -4 * qx, -4 * qy, 0},
            };
            double gq[4] = {0, 0, 0, 0};
            for (int e = 0; e < 9; e++)
                for (int fq = 0; fq < 4; fq++) gq[fq] += gR[e] * J[e][fq];
            // t = sum_{i<3} v_i (v_i . gq) / (lam_top - lam_i)
            double t[4] = {0, 0, 0, 0};
            for (int i = 0; i < 3; i++) {
                double gap = ctx.evals[3] - ctx.evals[i];
                if (gap < 1e-12) gap = 1e-12;
                double d = 0.0;
                for (int rr = 0; rr < 4; rr++) d += ctx.evecs[rr * 4 + i] * gq[rr];
                d /= gap;
                for (int rr = 0; rr < 4; rr++) t[rr] += ctx.evecs[rr * 4 + i] * d;
            }
            double gK[16];
            for (int a = 0; a < 4; a++)
                for (int b = 0; b < 4; b++) gK[a * 4 + b] = t[a] * ctx.q[b];
            double d00 = gK[0], d11 = gK[5], d22 = gK[10], d33 = gK[15];
            double s01 = gK[1] + gK[4], s02 = gK[2] + gK[8], s03 = gK[3] + gK[12];
            double s12 = gK[6] + gK[9], s13 = gK[7] + gK[13], s23 = gK[11] + gK[14];
            gC[0] = d00 + d11 - d22 - d33;          // C00
            gC[4] = d00 - d11 + d22 - d33;          // C11
            gC[8] = d00 - d11 - d22 + d33;          // C22
            gC[5] = s01 + s23;                      // C12
            gC[7] = -s01 + s23;                     // C21
            gC[6] = s02 + s13;                      // C20
            gC[2] = -s02 + s13;                     // C02
            gC[1] = s03 + s12;                      // C01
            gC[3] = -s03 + s12;                     // C10
        }
        // g_sel_c[m][i] = sum_j gC[i][j] refc[m][j]  (then * w if weighted)
        double gcom[3] = {0, 0, 0};
        for (int n = 0; n < N; n++)
            for (int d = 0; d < 3; d++) gcom[d] -= gxc[n * 3 + d];
        // g_sel = gC applied through C = sel_c^T refc, then through the
        // weighted centering sel_c = (sel - com) * w_raw
        std::vector<double> gsel((size_t)m * 3);
        for (int i = 0; i < m; i++) {
            for (int d = 0; d < 3; d++) {
                double v = 0.0;
                for (int j = 0; j < 3; j++) v += gC[d * 3 + j] * ctx.refc[i * 3 + j];
                if (!ctx.wraw.empty()) v *= ctx.wraw[i];
                gsel[i * 3 + d] = v;
            }
        }
        for (int i = 0; i < m; i++)
            for (int d = 0; d < 3; d++) gcom[d] -= gsel[i * 3 + d];
        for (int n = 0; n < N; n++)
            for (int d = 0; d < 3; d++) gxr[n * 3 + d] = gxc[n * 3 + d];
        for (int i = 0; i < m; i++)
            for (int d = 0; d < 3; d++)
                gxr[op.aidx[i] * 3 + d] += gsel[i * 3 + d] + ctx.wn[i] * gcom[d];
    }
    g = std::move(gx);
}

// ---------------------------------------------------------------------------
// model loading
// ---------------------------------------------------------------------------

struct Reader {
    const uint8_t* p;
    size_t left;
    bool fail = false;
    template <typename T>
    T get() {
        T v{};
        if (left < sizeof(T)) { fail = true; return v; }
        std::memcpy(&v, p, sizeof(T));
        p += sizeof(T);
        left -= sizeof(T);
        return v;
    }
    void bytes(void* dst, size_t n) {
        if (left < n) { fail = true; return; }
        std::memcpy(dst, p, n);
        p += n;
        left -= n;
    }
};

Model* load_model(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    std::fseek(f, 0, SEEK_END);
    long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(sz);
    if (std::fread(buf.data(), 1, sz, f) != (size_t)sz) { std::fclose(f); return nullptr; }
    std::fclose(f);
    if (sz < 8 || (std::memcmp(buf.data(), MAGIC_V1, 8) != 0 &&
                   std::memcmp(buf.data(), MAGIC_V2, 8) != 0)) return nullptr;
    const bool v2 = std::memcmp(buf.data(), MAGIC_V2, 8) == 0;
    Reader r{buf.data() + 8, (size_t)sz - 8};
    Model* M = new Model();
    M->state_ndim = r.get<int32_t>();
    int np = r.get<int32_t>();
    if (r.fail || np < 0 || np > 100000) { delete M; return nullptr; }
    M->params.resize(np);
    for (int i = 0; i < np; i++) {
        int nd = r.get<int32_t>();
        if (r.fail || nd < 0 || nd > 8) { delete M; return nullptr; }
        size_t tot = 1;
        M->params[i].dims.resize(nd);
        for (int d = 0; d < nd; d++) {
            M->params[i].dims[d] = r.get<int32_t>();
            tot *= (size_t)M->params[i].dims[d];
        }
        M->params[i].data.resize(tot);
        r.bytes(M->params[i].data.data(), tot * sizeof(double));
        if (r.fail) { delete M; return nullptr; }
    }
    int nops = r.get<int32_t>();
    if (r.fail || nops < 0 || nops > 10000) { delete M; return nullptr; }
    M->ops.resize(nops);
    for (int i = 0; i < nops; i++) {
        Op& op = M->ops[i];
        op.kind = r.get<int32_t>();
        switch (op.kind) {
            case OP_ALIGN: {
                op.ref_p = r.get<int32_t>();
                op.w_p = r.get<int32_t>();
                int m = r.get<int32_t>();
                if (r.fail || m < 0 || m > 1000000) { delete M; return nullptr; }
                op.aidx.resize(m);
                for (int j = 0; j < m; j++) op.aidx[j] = r.get<int32_t>();
                break;
            }
            case OP_FEATURES: {
                int nf = r.get<int32_t>();
                if (r.fail || nf < 0 || nf > 1000000) { delete M; return nullptr; }
                if (v2) {
                    int hb = r.get<int32_t>();
                    if (r.fail || hb < 0 || hb > 1) { delete M; return nullptr; }
                    op.has_box = hb != 0;
                    if (op.has_box) {
                        for (int d = 0; d < 3; d++) op.box[d] = r.get<double>();
                        if (r.fail || op.box[0] <= 0 || op.box[1] <= 0 ||
                            op.box[2] <= 0) { delete M; return nullptr; }
                    }
                }
                op.feats.resize(nf);
                for (int j = 0; j < nf; j++) {
                    op.feats[j].type = r.get<int32_t>();
                    int ni = r.get<int32_t>();
                    if (r.fail || ni < 0 || ni > 1000000) { delete M; return nullptr; }
                    op.feats[j].idx.resize(ni);
                    for (int u = 0; u < ni; u++) op.feats[j].idx[u] = r.get<int32_t>();
                    if (op.feats[j].type >= F_CONTACT) {
                        op.feats[j].r0 = r.get<double>();
                        op.feats[j].d0 = r.get<double>();
                        op.feats[j].nn = r.get<int32_t>();
                        op.feats[j].mm = r.get<int32_t>();
                        if (r.fail || op.feats[j].r0 <= 0.0 ||
                            op.feats[j].nn <= 0 ||
                            op.feats[j].mm <= op.feats[j].nn) {
                            delete M; return nullptr;
                        }
                    }
                }
                break;
            }
            case OP_MLP: case OP_STACKED: {
                op.act = r.get<int32_t>();
                if (op.kind == OP_STACKED) op.k = r.get<int32_t>();
                int nl = r.get<int32_t>();
                if (r.fail || nl < 0 || nl > 1000) { delete M; return nullptr; }
                op.layers.resize(nl);
                for (int j = 0; j < nl; j++) {
                    op.layers[j].first = r.get<int32_t>();
                    op.layers[j].second = r.get<int32_t>();
                }
                break;
            }
            default:
                delete M;
                return nullptr;
        }
    }
    if (r.fail) { delete M; return nullptr; }
    // output dimension from the terminal op
    if (!M->ops.empty()) {
        const Op& last = M->ops.back();
        if (last.kind == OP_MLP) {
            M->n_out = M->params[last.layers.back().first].dims[0];
        } else if (last.kind == OP_STACKED) {
            M->n_out = last.k * M->params[last.layers.back().first].dims[1];
        } else if (last.kind == OP_FEATURES) {
            int w = 0;
            for (const Feature& fe : last.feats) w += feature_width(fe);
            M->n_out = w;
        } else {
            delete M;  // alignment-terminated programs are not CVs
            return nullptr;
        }
    }
    return M;
}

int eval_frames(const Model& M, const double* x, long n_frames, long state,
                double* out_val, double* out_jac) {
    int K = M.n_out;
    if (K <= 0) return 3;
    Tape tape;
    for (long fr = 0; fr < n_frames; fr++) {
        std::vector<double> cur(x + fr * state, x + (fr + 1) * state);
        tape.align.clear();
        tape.feat.clear();
        tape.mlp.clear();
        tape.ctx_of.assign(M.ops.size(), -1);
        for (size_t oi = 0; oi < M.ops.size(); oi++) {
            const Op& op = M.ops[oi];
            std::vector<double> nxt;
            int rc = 0;
            switch (op.kind) {
                case OP_ALIGN:
                    tape.align.emplace_back();
                    tape.ctx_of[oi] = (int)tape.align.size() - 1;
                    rc = forward_align(M, op, cur, nxt, tape.align.back());
                    break;
                case OP_FEATURES:
                    tape.feat.emplace_back();
                    tape.ctx_of[oi] = (int)tape.feat.size() - 1;
                    forward_features(op, cur, nxt, tape.feat.back());
                    break;
                case OP_MLP:
                    tape.mlp.emplace_back();
                    tape.ctx_of[oi] = (int)tape.mlp.size() - 1;
                    rc = forward_mlp(M, op, cur, nxt, tape.mlp.back());
                    break;
                case OP_STACKED:
                    tape.mlp.emplace_back();
                    tape.ctx_of[oi] = (int)tape.mlp.size() - 1;
                    rc = forward_stacked(M, op, cur, nxt, tape.mlp.back());
                    break;
            }
            if (rc != 0) return rc;
            cur = std::move(nxt);
        }
        if ((int)cur.size() != K) return 3;
        std::memcpy(out_val + fr * K, cur.data(), K * sizeof(double));
        if (!out_jac) continue;
        // backward: K one-hot cotangents
        std::vector<double> g((size_t)K * K, 0.0);
        for (int r = 0; r < K; r++) g[(size_t)r * K + r] = 1.0;
        for (int oi = (int)M.ops.size() - 1; oi >= 0; oi--) {
            const Op& op = M.ops[oi];
            switch (op.kind) {
                case OP_ALIGN:
                    backward_align(op, tape.align[tape.ctx_of[oi]], K, g);
                    break;
                case OP_FEATURES:
                    backward_features(op, tape.feat[tape.ctx_of[oi]], K, g);
                    break;
                case OP_MLP:
                    backward_mlp(M, op, tape.mlp[tape.ctx_of[oi]], K, g);
                    break;
                case OP_STACKED:
                    backward_stacked(M, op, tape.mlp[tape.ctx_of[oi]], K, g);
                    break;
            }
        }
        if ((long)g.size() != (long)K * state) return 3;
        std::memcpy(out_jac + fr * K * state, g.data(),
                    (size_t)K * state * sizeof(double));
    }
    return 0;
}

}  // namespace

extern "C" {

void* cveval_load(const char* path) { return load_model(path); }

void cveval_free(void* h) { delete static_cast<Model*>(h); }

int cveval_n_out(void* h) { return static_cast<Model*>(h)->n_out; }

int cveval_eval(void* h, const double* x, long n_frames, long state,
                double* out_val) {
    return eval_frames(*static_cast<Model*>(h), x, n_frames, state, out_val,
                       nullptr);
}

int cveval_eval_grad(void* h, const double* x, long n_frames, long state,
                     double* out_val, double* out_jac) {
    return eval_frames(*static_cast<Model*>(h), x, n_frames, state, out_val,
                       out_jac);
}

}  // extern "C"
