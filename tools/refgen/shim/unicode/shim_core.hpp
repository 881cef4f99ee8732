// Minimal ICU API shim for building the unmodified reference C++ runtime
// without libicu.  Only the normalizer paths (tokenmonster.cpp:190-260)
// reference these symbols; fixture generation uses normalization-flag-0
// vocabularies and ASCII-fast-path inputs, so every function here either
// satisfies the ASCII fast path or throws.
#pragma once
#include <stdexcept>
#include <string>

using UErrorCode = int;
using UChar32 = int;
constexpr UErrorCode U_ZERO_ERROR = 0;
constexpr int U_NON_SPACING_MARK = 6;  // value irrelevant: never reached
inline bool U_FAILURE(UErrorCode c) { return c != 0; }
inline int u_charType(UChar32) {
  throw std::runtime_error("icu shim: charType unavailable");
}

namespace icu {

class StringPiece {
 public:
  StringPiece(const char*, int) {}
};

class Locale {
 public:
  static Locale getRoot() { return Locale(); }
};

class UnicodeString {
 public:
  UnicodeString() = default;
  static UnicodeString fromUTF8(const StringPiece&) {
    throw std::runtime_error("icu shim: non-ASCII normalization unavailable");
  }
  void toLower(const Locale&) {}
  void toUTF8String(std::string&) const {}
};

class Normalizer2 {
 public:
  static Normalizer2* getNFDInstance(UErrorCode& status) {
    status = 1;  // callers throw "normalization error"
    return nullptr;
  }
  void normalize(const UnicodeString&, UnicodeString&, UErrorCode& s) const {
    s = 1;
  }
};

}  // namespace icu
