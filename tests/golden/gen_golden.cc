// Test-fixture generator: drives the REFERENCE range coder (read-only mount
// at /root/reference) to produce golden bitstreams that pin down bit-exact
// parity of this repo's coders.  This file is a test harness only — no
// reference code is copied into the framework; the reference .cc is compiled
// directly from its mount point and the resulting bytes are stored under
// tests/golden/.
//
// Build (see gen_golden.sh):
//   g++ -O2 -std=c++17 -I$TF_INC -I/root/reference gen_golden.cc \
//       $TF_LIB/libtensorflow_framework.so.2 -o gen_golden
//
// Protocol (stdin/stdout, text):
//   E <precision> <n>        then n lines "<lower> <upper>"  -> hex bytes
//   D <precision> <hexbytes> <cdf_len> <cdf...> <n>          -> n symbols
#include <cstdint>
#include <cstdio>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "tensorflow_compression/cc/lib/range_coder.h"

using tensorflow_compression::RangeDecoder;
using tensorflow_compression::RangeEncoder;

static std::string hex(const std::string& s) {
  std::string out;
  char buf[3];
  for (unsigned char c : s) {
    snprintf(buf, 3, "%02x", c);
    out += buf;
  }
  return out.empty() ? "-" : out;
}

static std::string unhex(const std::string& h) {
  std::string out;
  if (h == "-") return out;
  for (size_t i = 0; i + 1 < h.size(); i += 2) {
    out.push_back(static_cast<char>(std::stoi(h.substr(i, 2), nullptr, 16)));
  }
  return out;
}

int main() {
  std::string line;
  while (std::getline(std::cin, line)) {
    std::istringstream is(line);
    char cmd = 0;
    is >> cmd;
    if (cmd == 'E') {
      int n;
      is >> n;
      RangeEncoder enc;
      std::string sink;
      for (int i = 0; i < n; ++i) {
        int lower, upper, precision;
        std::cin >> lower >> upper >> precision;
        enc.Encode(lower, upper, precision, &sink);
      }
      if (n > 0) std::cin.ignore();
      enc.Finalize(&sink);
      std::cout << hex(sink) << "\n" << std::flush;
    } else if (cmd == 'D') {
      int precision, cdf_len, n;
      std::string h;
      is >> precision >> h >> cdf_len;
      std::vector<int32_t> cdf(cdf_len);
      for (auto& c : cdf) is >> c;
      is >> n;
      std::string src = unhex(h);
      RangeDecoder dec(src);
      for (int i = 0; i < n; ++i) {
        std::cout << dec.Decode(absl::MakeConstSpan(cdf), precision)
                  << (i + 1 < n ? ' ' : '\n');
      }
      if (n == 0) std::cout << "\n";
      std::cout << (dec.Finalize() ? "ok" : "fail") << "\n" << std::flush;
    } else if (cmd == 'Q') {
      break;
    }
  }
  return 0;
}
