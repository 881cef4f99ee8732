// Conformance-fixture generator: drives the UNMODIFIED reference C++
// runtime (tokenmonster-cpp) to produce golden token ids.
// Usage: refgen VOCAB INPUT_FILE  -> stdout: "missing N" then one id/line.
#include <cstdio>
#include <fstream>
#include <iostream>
#include <vector>
#include <tokenmonster/tokenmonster.hpp>

int main(int argc, char** argv) {
  if (argc != 3) { std::fprintf(stderr, "usage: refgen VOCAB INPUT\n"); return 2; }
  auto vocab = tokenmonster::Vocab::load(argv[1]);
  std::ifstream f(argv[2], std::ios::binary);
  std::vector<std::uint8_t> data((std::istreambuf_iterator<char>(f)),
                                 std::istreambuf_iterator<char>());
  auto res = vocab.tokenize(std::span<const std::uint8_t>(data.data(), data.size()));
  std::printf("missing %d\n", res.missing);
  for (auto id : res.tokens) std::printf("%u\n", id);
  return 0;
}
