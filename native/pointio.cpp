// Native host-side point-cloud kernels for the data pipeline.
//
// The reference's host-side throughput comes from torch DataLoader worker
// processes running numpy; here the per-sample hot loop (load .bin ->
// range-filter -> transform -> shuffle -> pad into the fixed-capacity
// buffer) is one C++ pass, exposed through the CPython C API (no pybind11
// in this image).  srfdet3d_tpu/data/native.py wraps it with a numpy
// fallback.
//
// Functions:
//   load_points(path, load_dim) -> float32 ndarray (N, load_dim)
//   filter_pad(points, pc_range(6), cap, shuffle, seed)
//       -> (padded (cap, D) float32, mask (cap,) bool)
//   transform_points(points, rot3x3, trans3) -> in-place xyz transform

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

static PyObject* load_points(PyObject*, PyObject* args) {
  const char* path;
  int load_dim;
  if (!PyArg_ParseTuple(args, "si", &path, &load_dim)) return nullptr;
  if (load_dim <= 0) {
    PyErr_Format(PyExc_ValueError, "load_dim must be > 0, got %d", load_dim);
    return nullptr;
  }

  FILE* f = nullptr;
  Py_BEGIN_ALLOW_THREADS
  f = std::fopen(path, "rb");
  Py_END_ALLOW_THREADS
  if (!f) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);
    return nullptr;
  }
  std::fseek(f, 0, SEEK_END);
  long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const long row_bytes = static_cast<long>(sizeof(float)) * load_dim;
  if (bytes % row_bytes != 0) {
    // the numpy fallback (fromfile + reshape) raises on trailing partial
    // rows; silent truncation would hide file corruption
    std::fclose(f);
    PyErr_Format(PyExc_ValueError,
                 "%s: %ld bytes is not a multiple of %ld (corrupt file?)",
                 path, bytes, row_bytes);
    return nullptr;
  }
  npy_intp n = bytes / row_bytes;
  npy_intp dims[2] = {n, load_dim};
  PyObject* arr = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  if (!arr) {
    std::fclose(f);
    return nullptr;
  }
  size_t want = static_cast<size_t>(n) * load_dim;
  size_t got = 0;
  void* dst = PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr));
  Py_BEGIN_ALLOW_THREADS
  got = std::fread(dst, sizeof(float), want, f);
  std::fclose(f);
  Py_END_ALLOW_THREADS
  if (got != want) {
    Py_DECREF(arr);
    PyErr_Format(PyExc_IOError, "short read on %s", path);
    return nullptr;
  }
  return arr;
}

static PyObject* filter_pad(PyObject*, PyObject* args) {
  PyArrayObject* pts_obj;
  PyArrayObject* range_obj;
  long cap;
  int shuffle;
  unsigned long seed;
  if (!PyArg_ParseTuple(args, "O!O!lik", &PyArray_Type, &pts_obj,
                        &PyArray_Type, &range_obj, &cap, &shuffle, &seed))
    return nullptr;

  PyArrayObject* pts = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(reinterpret_cast<PyObject*>(pts_obj), NPY_FLOAT32,
                       NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  PyArrayObject* rng_arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(reinterpret_cast<PyObject*>(range_obj), NPY_FLOAT32,
                       NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  if (!pts || !rng_arr) {
    Py_XDECREF(pts);
    Py_XDECREF(rng_arr);
    return nullptr;
  }
  if (PyArray_NDIM(pts) != 2 || PyArray_DIM(pts, 1) < 3 ||
      PyArray_NDIM(rng_arr) != 1 || PyArray_DIM(rng_arr, 0) < 6 ||
      cap < 0) {
    PyErr_SetString(PyExc_ValueError,
                    "filter_pad needs points (N, >=3), pc_range (>=6,), "
                    "cap >= 0");
    Py_DECREF(pts);
    Py_DECREF(rng_arr);
    return nullptr;
  }
  const npy_intp n = PyArray_DIM(pts, 0);
  const npy_intp d = PyArray_DIM(pts, 1);
  const float* src = static_cast<const float*>(PyArray_DATA(pts));
  const float* r = static_cast<const float*>(PyArray_DATA(rng_arr));

  npy_intp out_dims[2] = {cap, d};
  PyObject* out = PyArray_ZEROS(2, out_dims, NPY_FLOAT32, 0);
  npy_intp mask_dims[1] = {cap};
  PyObject* mask = PyArray_ZEROS(1, mask_dims, NPY_BOOL, 0);
  if (!out || !mask) {
    Py_XDECREF(out);
    Py_XDECREF(mask);
    Py_DECREF(pts);
    Py_DECREF(rng_arr);
    return nullptr;
  }
  float* dst = static_cast<float*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(out)));
  npy_bool* m = static_cast<npy_bool*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(mask)));

  long kept = 0;
  Py_BEGIN_ALLOW_THREADS {
    // pass 1: collect in-range row indices
    std::vector<npy_intp> idx;
    idx.reserve(n);
    for (npy_intp i = 0; i < n; ++i) {
      const float* p = src + i * d;
      if (p[0] >= r[0] && p[0] <= r[3] && p[1] >= r[1] && p[1] <= r[4] &&
          p[2] >= r[2] && p[2] <= r[5])
        idx.push_back(i);
    }
    if (shuffle) {
      std::mt19937_64 gen(seed);
      for (size_t i = idx.size(); i > 1; --i) {
        size_t j = gen() % i;
        std::swap(idx[i - 1], idx[j]);
      }
    }
    kept = static_cast<long>(idx.size());
    if (kept > cap) kept = cap;
    for (long i = 0; i < kept; ++i) {
      std::memcpy(dst + static_cast<npy_intp>(i) * d, src + idx[i] * d,
                  sizeof(float) * d);
      m[i] = NPY_TRUE;
    }
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(pts);
  Py_DECREF(rng_arr);
  return Py_BuildValue("(NN)", out, mask);
}

static PyObject* transform_points(PyObject*, PyObject* args) {
  PyArrayObject* pts_obj;
  PyArrayObject* rot_obj;
  PyArrayObject* trans_obj;
  if (!PyArg_ParseTuple(args, "O!O!O!", &PyArray_Type, &pts_obj,
                        &PyArray_Type, &rot_obj, &PyArray_Type, &trans_obj))
    return nullptr;
  if (PyArray_TYPE(pts_obj) != NPY_FLOAT32 ||
      !PyArray_IS_C_CONTIGUOUS(pts_obj)) {
    PyErr_SetString(PyExc_TypeError, "points must be contiguous float32");
    return nullptr;
  }
  PyArrayObject* rot = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(reinterpret_cast<PyObject*>(rot_obj), NPY_FLOAT32,
                       NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  PyArrayObject* tr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(reinterpret_cast<PyObject*>(trans_obj), NPY_FLOAT32,
                       NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  if (!rot || !tr) {
    Py_XDECREF(rot);
    Py_XDECREF(tr);
    return nullptr;
  }
  if (PyArray_NDIM(pts_obj) != 2 || PyArray_DIM(pts_obj, 1) < 3 ||
      PyArray_NDIM(rot) != 2 || PyArray_DIM(rot, 0) * PyArray_DIM(rot, 1)
      < 9 || PyArray_SIZE(tr) < 3) {
    PyErr_SetString(PyExc_ValueError,
                    "transform_points needs points (N, >=3), rot (3, 3), "
                    "trans (3,)");
    Py_DECREF(rot);
    Py_DECREF(tr);
    return nullptr;
  }
  const npy_intp n = PyArray_DIM(pts_obj, 0);
  const npy_intp d = PyArray_DIM(pts_obj, 1);
  float* p = static_cast<float*>(PyArray_DATA(pts_obj));
  const float* R = static_cast<const float*>(PyArray_DATA(rot));
  const float* t = static_cast<const float*>(PyArray_DATA(tr));
  Py_BEGIN_ALLOW_THREADS
  for (npy_intp i = 0; i < n; ++i) {
    float* q = p + i * d;
    const float x = q[0], y = q[1], z = q[2];
    q[0] = R[0] * x + R[1] * y + R[2] * z + t[0];
    q[1] = R[3] * x + R[4] * y + R[5] * z + t[1];
    q[2] = R[6] * x + R[7] * y + R[8] * z + t[2];
  }
  Py_END_ALLOW_THREADS
  Py_DECREF(rot);
  Py_DECREF(tr);
  Py_RETURN_NONE;
}

static PyMethodDef Methods[] = {
    {"load_points", load_points, METH_VARARGS,
     "load_points(path, load_dim) -> (N, load_dim) float32"},
    {"filter_pad", filter_pad, METH_VARARGS,
     "filter_pad(points, pc_range, cap, shuffle, seed) -> (padded, mask)"},
    {"transform_points", transform_points, METH_VARARGS,
     "transform_points(points, rot3x3, trans3) in-place"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT,
                                       "srfdet3d_native", nullptr, -1,
                                       Methods};

PyMODINIT_FUNC PyInit_srfdet3d_native(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
