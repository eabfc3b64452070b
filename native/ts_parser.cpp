// Native .ts (UCR/UEA sktime format) parser.
//
// The reference delegates parsing to sktime's pure-python reader
// (/root/reference/DataSource.py:12-14), which dominates startup time on
// large archive files.  This parser does a single pass over the file with
// manual float scanning and no per-token allocation; the Python side binds
// it via ctypes (see data/native.py).
//
// Exported C ABI:
//   ts_parse(path) -> opaque handle (NULL on failure)
//   ts_dims(handle, out[3])           N, C, T
//   ts_values(handle) -> const float* (N*C*T, NaN-padded, row-major N,C,T)
//   ts_label(handle, i) -> const char*
//   ts_free(handle)
//
// Build: g++ -O3 -shared -fPIC -o libtsparse.so ts_parser.cpp

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct TsData {
  long n = 0, c = 0, t = 0;
  std::vector<float> values;           // N*C*T
  std::vector<std::string> labels;     // N
};

// Parse one data line: dims separated by ':', values by ',', final field is
// the class label when has_labels.
void parse_line(const char* line, bool has_labels,
                std::vector<std::vector<float>>* dims, std::string* label) {
  const char* last_colon = nullptr;
  if (has_labels) {
    last_colon = strrchr(line, ':');
  }
  const char* end = last_colon ? last_colon : line + strlen(line);
  if (last_colon) {
    const char* p = last_colon + 1;
    while (*p == ' ' || *p == '\t') p++;
    std::string lab(p);
    while (!lab.empty() && (lab.back() == '\n' || lab.back() == '\r' ||
                            lab.back() == ' '))
      lab.pop_back();
    *label = lab;
  }
  dims->emplace_back();
  const char* p = line;
  while (p < end) {
    if (*p == ':') {
      dims->emplace_back();
      p++;
      continue;
    }
    if (*p == ',' || *p == ' ' || *p == '\t') {
      p++;
      continue;
    }
    if (*p == '?') {
      dims->back().push_back(NAN);
      p++;
      continue;
    }
    char* next = nullptr;
    float v = strtof(p, &next);
    if (next == p) {
      p++;
      continue;
    }
    dims->back().push_back(v);
    p = next;
  }
}

}  // namespace

extern "C" {

void* ts_parse(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;

  auto* data = new TsData();
  std::vector<std::vector<std::vector<float>>> cases;
  bool in_data = false, has_labels = false;

  char* line = nullptr;
  size_t cap = 0;
  ssize_t len;
  while ((len = getline(&line, &cap, f)) != -1) {
    char* s = line;
    while (*s == ' ' || *s == '\t') s++;
    if (*s == '#' || *s == '\n' || *s == '\r' || *s == '\0') continue;
    if (!in_data) {
      if (strncasecmp(s, "@classlabel", 11) == 0 ||
          strncasecmp(s, "@targetlabel", 12) == 0) {
        const char* sp = strchr(s, ' ');
        has_labels = sp && strncasecmp(sp + 1, "true", 4) == 0;
      } else if (strncasecmp(s, "@data", 5) == 0) {
        in_data = true;
      }
      continue;
    }
    cases.emplace_back();
    data->labels.emplace_back();
    parse_line(s, has_labels, &cases.back(), &data->labels.back());
  }
  free(line);
  fclose(f);

  if (cases.empty()) {
    delete data;
    return nullptr;
  }
  long n = (long)cases.size(), c = 0, t = 0;
  for (auto& cs : cases) {
    c = std::max(c, (long)cs.size());
    for (auto& d : cs) t = std::max(t, (long)d.size());
  }
  data->n = n;
  data->c = c;
  data->t = t;
  data->values.assign((size_t)n * c * t, NAN);
  for (long i = 0; i < n; i++)
    for (long j = 0; j < (long)cases[i].size(); j++)
      memcpy(&data->values[((size_t)i * c + j) * t], cases[i][j].data(),
             cases[i][j].size() * sizeof(float));
  return data;
}

void ts_dims(void* handle, long* out) {
  auto* d = static_cast<TsData*>(handle);
  out[0] = d->n;
  out[1] = d->c;
  out[2] = d->t;
}

const float* ts_values(void* handle) {
  return static_cast<TsData*>(handle)->values.data();
}

const char* ts_label(void* handle, long i) {
  return static_cast<TsData*>(handle)->labels[(size_t)i].c_str();
}

void ts_free(void* handle) { delete static_cast<TsData*>(handle); }

}  // extern "C"
