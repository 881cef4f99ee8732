// Build shim for generating conformance fixtures from the UNMODIFIED
// reference C++ runtime (/root/reference/tokenmonster-cpp).  The real
// capcode-cpp dependency is not vendored in the reference; fixtures are
// generated only for capcode-0 vocabularies, where none of these entry
// points is ever invoked (tokenmonster.cpp:477-480 guards on using_capcode).
#pragma once
#include <cstdint>
#include <span>
#include <stdexcept>
#include <vector>

namespace capcode {
using Bytes = std::vector<std::uint8_t>;

[[noreturn]] inline void unavailable() {
  throw std::runtime_error("capcode shim: fixture generation only supports capcode 0");
}
inline Bytes encode(std::span<const std::uint8_t>) { unavailable(); }
inline Bytes no_capcode_encode(std::span<const std::uint8_t>) { unavailable(); }
inline Bytes decode(Bytes) { unavailable(); }
inline Bytes no_capcode_decode(Bytes) { unavailable(); }

class Decoder {
 public:
  template <class T> Bytes decode(const T&) { unavailable(); }
  template <class T> Bytes no_capcode_decode(const T&) { unavailable(); }
};
}  // namespace capcode
