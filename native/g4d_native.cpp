/* Garment4D-TPU native IO kernels.
 *
 * The reference's input pipeline is the hot CPU path (per-frame pickle/.bin
 * reads, OBJ parsing and barycentric remeshing inside torch DataLoader
 * workers; reference utils/dataloader.py + utils/mesh_utils.py). This
 * extension provides the IO-bound pieces as native code:
 *
 *   read_bin(path)                -> bytes (raw little-endian float payload)
 *   read_bin_batch([paths])       -> [bytes] (thread pool, GIL released)
 *   parse_obj(path)               -> (vert_bytes f32*3, face_idx i32 bytes,
 *                                      face_offsets i32 bytes)
 *   barycentric(verts, ind, w, m) -> bytes (m x 3 f32): out[i] = sum_k
 *                                      w[i,k] * verts[ind[i,k]]
 *
 * Built with plain CPython C API (no pybind11 in the image); numpy arrays
 * cross the boundary as buffers.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

static bool read_file(const char* path, std::string* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(size));
  size_t got = size ? std::fread(&(*out)[0], 1, static_cast<size_t>(size), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(size);
}

PyObject* py_read_bin(PyObject*, PyObject* args) {
  const char* path = nullptr;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  std::string buf;
  bool ok;
  Py_BEGIN_ALLOW_THREADS;
  ok = read_file(path, &buf);
  Py_END_ALLOW_THREADS;
  if (!ok) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot read %s", path);
    return nullptr;
  }
  return PyBytes_FromStringAndSize(buf.data(), static_cast<Py_ssize_t>(buf.size()));
}

PyObject* py_read_bin_batch(PyObject*, PyObject* args) {
  PyObject* list = nullptr;
  int n_threads = 8;
  if (!PyArg_ParseTuple(args, "O|i", &list, &n_threads)) return nullptr;
  if (!PyList_Check(list)) {
    PyErr_SetString(PyExc_TypeError, "expected list of paths");
    return nullptr;
  }
  Py_ssize_t n = PyList_Size(list);
  std::vector<std::string> paths(static_cast<size_t>(n));
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PyList_GetItem(list, i);
    const char* s = PyUnicode_AsUTF8(item);
    if (!s) return nullptr;
    paths[static_cast<size_t>(i)] = s;
  }
  std::vector<std::string> bufs(paths.size());
  std::vector<uint8_t> ok(paths.size(), 0);
  Py_BEGIN_ALLOW_THREADS;
  {
    std::atomic<size_t> next{0};
    auto worker = [&]() {
      for (;;) {
        size_t i = next.fetch_add(1);
        if (i >= paths.size()) break;
        ok[i] = read_file(paths[i].c_str(), &bufs[i]) ? 1 : 0;
      }
    };
    size_t nt = std::min<size_t>(static_cast<size_t>(n_threads > 0 ? n_threads : 1),
                                 paths.size() ? paths.size() : 1);
    std::vector<std::thread> threads;
    for (size_t t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  Py_END_ALLOW_THREADS;
  for (size_t i = 0; i < paths.size(); ++i) {
    if (!ok[i]) {
      PyErr_Format(PyExc_FileNotFoundError, "cannot read %s", paths[i].c_str());
      return nullptr;
    }
  }
  PyObject* out = PyList_New(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyList_SetItem(out, i, PyBytes_FromStringAndSize(
        bufs[static_cast<size_t>(i)].data(),
        static_cast<Py_ssize_t>(bufs[static_cast<size_t>(i)].size())));
  }
  return out;
}

/* Minimal OBJ parser: v and f records (1-based indices, tri/quad/ngon). */
PyObject* py_parse_obj(PyObject*, PyObject* args) {
  const char* path = nullptr;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  std::string buf;
  std::vector<float> verts;
  std::vector<int32_t> face_idx;
  std::vector<int32_t> face_off;  // prefix offsets, face i = [off[i], off[i+1])
  bool ok;
  Py_BEGIN_ALLOW_THREADS;
  ok = read_file(path, &buf);
  if (ok) {
    face_off.push_back(0);
    const char* p = buf.data();
    const char* end = p + buf.size();
    while (p < end) {
      const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
      if (!line_end) line_end = end;
      if (p + 1 < line_end) {
        if (p[0] == 'v' && p[1] == ' ') {
          char* q = const_cast<char*>(p) + 2;
          for (int c = 0; c < 3; ++c) verts.push_back(std::strtof(q, &q));
        } else if (p[0] == 'f' && p[1] == ' ') {
          const char* q = p + 2;
          while (q < line_end) {
            while (q < line_end && *q == ' ') ++q;
            if (q >= line_end) break;
            char* next = nullptr;
            long v = std::strtol(q, &next, 10);
            if (next == q) break;
            face_idx.push_back(static_cast<int32_t>(v - 1));
            q = next;
            while (q < line_end && *q != ' ') ++q;  // skip /vt/vn part
          }
          face_off.push_back(static_cast<int32_t>(face_idx.size()));
        }
      }
      p = line_end + 1;
    }
  }
  Py_END_ALLOW_THREADS;
  if (!ok) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot read %s", path);
    return nullptr;
  }
  PyObject* vb = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(verts.data()),
      static_cast<Py_ssize_t>(verts.size() * sizeof(float)));
  PyObject* fb = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(face_idx.data()),
      static_cast<Py_ssize_t>(face_idx.size() * sizeof(int32_t)));
  PyObject* ob = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(face_off.data()),
      static_cast<Py_ssize_t>(face_off.size() * sizeof(int32_t)));
  PyObject* tuple = PyTuple_Pack(3, vb, fb, ob);
  Py_DECREF(vb);
  Py_DECREF(fb);
  Py_DECREF(ob);
  return tuple;
}

/* out[i] = sum_k w[i,k] * verts[ind[i,k]] for k in 0..2 (barycentric remesh,
 * reference utils/mesh_utils.py:136-139). */
PyObject* py_barycentric(PyObject*, PyObject* args) {
  Py_buffer verts_buf, ind_buf, w_buf;
  if (!PyArg_ParseTuple(args, "y*y*y*", &verts_buf, &ind_buf, &w_buf))
    return nullptr;
  const float* verts = static_cast<const float*>(verts_buf.buf);
  const int64_t* ind = static_cast<const int64_t*>(ind_buf.buf);
  const double* w = static_cast<const double*>(w_buf.buf);
  size_t m = static_cast<size_t>(ind_buf.len) / (3 * sizeof(int64_t));
  size_t n_verts = static_cast<size_t>(verts_buf.len) / (3 * sizeof(float));
  std::vector<float> out(m * 3);
  bool in_range = true;
  Py_BEGIN_ALLOW_THREADS;
  for (size_t i = 0; i < m; ++i) {
    double acc[3] = {0, 0, 0};
    for (int k = 0; k < 3; ++k) {
      int64_t vi = ind[i * 3 + k];
      if (vi < 0 || static_cast<size_t>(vi) >= n_verts) {
        in_range = false;
        break;
      }
      double ww = w[i * 3 + k];
      acc[0] += ww * verts[vi * 3 + 0];
      acc[1] += ww * verts[vi * 3 + 1];
      acc[2] += ww * verts[vi * 3 + 2];
    }
    out[i * 3 + 0] = static_cast<float>(acc[0]);
    out[i * 3 + 1] = static_cast<float>(acc[1]);
    out[i * 3 + 2] = static_cast<float>(acc[2]);
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&verts_buf);
  PyBuffer_Release(&ind_buf);
  PyBuffer_Release(&w_buf);
  if (!in_range) {
    PyErr_SetString(PyExc_IndexError, "barycentric index out of range");
    return nullptr;
  }
  return PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()),
      static_cast<Py_ssize_t>(out.size() * sizeof(float)));
}

PyMethodDef methods[] = {
    {"read_bin", py_read_bin, METH_VARARGS, "read a binary file to bytes"},
    {"read_bin_batch", py_read_bin_batch, METH_VARARGS,
     "read many files with a thread pool"},
    {"parse_obj", py_parse_obj, METH_VARARGS,
     "parse OBJ: (verts f32 bytes, face idx i32 bytes, face offsets i32 bytes)"},
    {"barycentric", py_barycentric, METH_VARARGS,
     "barycentric interpolation (verts f32, ind i64, w f64) -> f32 bytes"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "g4d_native",
                      "Garment4D-TPU native IO kernels", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_g4d_native(void) { return PyModule_Create(&module); }
