// Native KD-tree for CPU nearest-neighbor queries.
//
// The reference offloads all CPU-side nearest-neighbor work to external
// native libraries: point_cloud_utils' C++ KD-tree for Chamfer/PR eval
// (eval_utils.py:416-489), sklearn's trees for clustering
// (clustering.py:21) and Open3D's for statistical outlier removal
// (filtering.py:59-69). This extension is the framework's own equivalent:
// a 3-D balanced KD-tree (median split over the widest axis) with
// best-first k-NN search and thread-parallel batched queries, exposed to
// Python through the raw CPython + NumPy C API (no pybind11 dependency).
//
// Build: python setup.py build_ext --inplace   (see repo root)
// Python API: edgegaussians_tpu.native.kdtree.query(data[N,3], queries[M,3],
//             k) -> (dists[M,k] f64, indices[M,k] i64)

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

struct Node {
  int32_t left = -1;
  int32_t right = -1;
  int32_t begin = 0;   // leaf: range into point index array
  int32_t end = 0;
  int8_t axis = -1;    // -1 => leaf
  double split = 0.0;
};

constexpr int kLeafSize = 16;

struct KdTree {
  const double* pts;                // [n,3]
  int64_t n;
  std::vector<int32_t> order;       // permutation of point ids
  std::vector<Node> nodes;

  explicit KdTree(const double* pts_, int64_t n_) : pts(pts_), n(n_) {
    order.resize(n);
    for (int64_t i = 0; i < n; ++i) order[i] = static_cast<int32_t>(i);
    nodes.reserve(2 * n / kLeafSize + 8);
    build(0, static_cast<int32_t>(n));
  }

  int32_t build(int32_t begin, int32_t end) {
    int32_t id = static_cast<int32_t>(nodes.size());
    nodes.emplace_back();
    if (end - begin <= kLeafSize) {
      nodes[id].begin = begin;
      nodes[id].end = end;
      return id;
    }
    // widest-spread axis
    double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
    for (int32_t i = begin; i < end; ++i) {
      const double* p = pts + 3 * order[i];
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], p[a]);
        hi[a] = std::max(hi[a], p[a]);
      }
    }
    int axis = 0;
    double spread = hi[0] - lo[0];
    for (int a = 1; a < 3; ++a)
      if (hi[a] - lo[a] > spread) { spread = hi[a] - lo[a]; axis = a; }

    int32_t mid = begin + (end - begin) / 2;
    std::nth_element(order.begin() + begin, order.begin() + mid,
                     order.begin() + end,
                     [&](int32_t a, int32_t b) {
                       return pts[3 * a + axis] < pts[3 * b + axis];
                     });
    double split = pts[3 * order[mid] + axis];

    nodes[id].axis = static_cast<int8_t>(axis);
    nodes[id].split = split;
    int32_t l = build(begin, mid);
    int32_t r = build(mid, end);
    nodes[id].left = l;
    nodes[id].right = r;
    return id;
  }

  // k-NN via bounded max-heap over candidate distances.
  void query(const double* q, int k, double* out_d, int64_t* out_i) const {
    struct Cand { double d2; int32_t idx; };
    std::vector<Cand> heap;
    heap.reserve(k + 1);
    auto cmp = [](const Cand& a, const Cand& b) { return a.d2 < b.d2; };

    auto consider = [&](int32_t pid) {
      const double* p = pts + 3 * pid;
      double dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
      double d2 = dx * dx + dy * dy + dz * dz;
      if (static_cast<int>(heap.size()) < k) {
        heap.push_back({d2, pid});
        std::push_heap(heap.begin(), heap.end(), cmp);
      } else if (d2 < heap.front().d2) {
        std::pop_heap(heap.begin(), heap.end(), cmp);
        heap.back() = {d2, pid};
        std::push_heap(heap.begin(), heap.end(), cmp);
      }
    };

    // iterative DFS, near child first, pruned by current k-th distance
    std::vector<int32_t> stack;
    stack.push_back(0);
    while (!stack.empty()) {
      int32_t id = stack.back();
      stack.pop_back();
      const Node& nd = nodes[id];
      if (nd.axis < 0) {
        for (int32_t i = nd.begin; i < nd.end; ++i) consider(order[i]);
        continue;
      }
      double delta = q[nd.axis] - nd.split;
      int32_t near = delta <= 0 ? nd.left : nd.right;
      int32_t far = delta <= 0 ? nd.right : nd.left;
      double worst = static_cast<int>(heap.size()) < k
                         ? 1e300 : heap.front().d2;
      if (delta * delta <= worst) stack.push_back(far);
      stack.push_back(near);
    }

    std::sort_heap(heap.begin(), heap.end(), cmp);  // ascending distance
    int m = static_cast<int>(heap.size());
    for (int i = 0; i < k; ++i) {
      if (i < m) {
        out_d[i] = std::sqrt(heap[i].d2);
        out_i[i] = heap[i].idx;
      } else {            // fewer points than k: pad with the farthest
        out_d[i] = m ? out_d[m - 1] : 0.0;
        out_i[i] = m ? out_i[m - 1] : 0;
      }
    }
  }
};

PyObject* kdtree_query(PyObject*, PyObject* args) {
  PyObject *data_obj, *query_obj;
  int k;
  if (!PyArg_ParseTuple(args, "OOi", &data_obj, &query_obj, &k))
    return nullptr;
  if (k <= 0) {
    PyErr_SetString(PyExc_ValueError, "k must be positive");
    return nullptr;
  }

  PyArrayObject* data = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(data_obj, NPY_DOUBLE,
                       NPY_ARRAY_IN_ARRAY | NPY_ARRAY_C_CONTIGUOUS));
  PyArrayObject* query = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(query_obj, NPY_DOUBLE,
                       NPY_ARRAY_IN_ARRAY | NPY_ARRAY_C_CONTIGUOUS));
  if (!data || !query) {
    Py_XDECREF(data);
    Py_XDECREF(query);
    return nullptr;
  }
  if (PyArray_NDIM(data) != 2 || PyArray_DIM(data, 1) != 3 ||
      PyArray_NDIM(query) != 2 || PyArray_DIM(query, 1) != 3) {
    PyErr_SetString(PyExc_ValueError, "expected [N,3] float64 arrays");
    Py_DECREF(data);
    Py_DECREF(query);
    return nullptr;
  }
  int64_t n = PyArray_DIM(data, 0);
  int64_t m = PyArray_DIM(query, 0);
  if (n == 0) {
    PyErr_SetString(PyExc_ValueError, "empty data cloud");
    Py_DECREF(data);
    Py_DECREF(query);
    return nullptr;
  }
  int keff = k;

  npy_intp out_dims[2] = {m, keff};
  PyArrayObject* out_d = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(2, out_dims, NPY_DOUBLE));
  PyArrayObject* out_i = reinterpret_cast<PyArrayObject*>(
      PyArray_SimpleNew(2, out_dims, NPY_INT64));

  const double* dptr = static_cast<const double*>(PyArray_DATA(data));
  const double* qptr = static_cast<const double*>(PyArray_DATA(query));
  double* od = static_cast<double*>(PyArray_DATA(out_d));
  int64_t* oi = static_cast<int64_t*>(PyArray_DATA(out_i));

  Py_BEGIN_ALLOW_THREADS
  KdTree tree(dptr, n);
  unsigned hw = std::thread::hardware_concurrency();
  int n_threads = std::max(1u, std::min<unsigned>(hw, 16));
  if (m < 1024) n_threads = 1;
  std::vector<std::thread> workers;
  int64_t chunk = (m + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t b = t * chunk, e = std::min<int64_t>(m, b + chunk);
    if (b >= e) break;
    workers.emplace_back([&, b, e]() {
      for (int64_t i = b; i < e; ++i)
        tree.query(qptr + 3 * i, keff, od + keff * i, oi + keff * i);
    });
  }
  for (auto& w : workers) w.join();
  Py_END_ALLOW_THREADS

  Py_DECREF(data);
  Py_DECREF(query);
  return Py_BuildValue("(NN)", out_d, out_i);
}

PyMethodDef kdtree_methods[] = {
    {"query", kdtree_query, METH_VARARGS,
     "query(data[N,3], queries[M,3], k) -> (dists[M,k], indices[M,k])"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kdtree_module = {
    PyModuleDef_HEAD_INIT, "kdtree",
    "Native KD-tree for batched k-NN queries", -1, kdtree_methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_kdtree(void) {
  import_array();
  return PyModule_Create(&kdtree_module);
}
