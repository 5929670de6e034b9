// Native JSON5 parser — CPython extension.
//
// The reference implements its program parser natively (reference:
// rust-project/src/parser.rs + the json5 crate); this is the TPU build's
// native equivalent for the host data-loading path: a single-pass
// recursive-descent JSON5 reader producing Python objects directly.
// Semantics are identical to the pure-Python parser in
// interpolation_engine_tpu/json5/parser.py (differentially tested);
// the Python module transparently prefers this extension when built.
//
// Build: python -m interpolation_engine_tpu.native.build
//
// Supported surface: // and /* */ comments, unquoted identifier keys,
// single/double quoted strings with \uXXXX (incl. surrogate pairs), \xXX,
// line continuations and any-char escapes, trailing commas, hex ints,
// leading +, .5 / 5. floats, Infinity and NaN.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Parser {
    const char* text;   // UTF-8 bytes
    Py_ssize_t pos;
    Py_ssize_t n;
    bool failed;
    std::string error;
    Py_ssize_t error_pos;

    explicit Parser(const char* t, Py_ssize_t len)
        : text(t), pos(0), n(len), failed(false), error_pos(0) {}

    void fail(const std::string& message, Py_ssize_t at = -1) {
        if (failed) return;
        failed = true;
        error = message;
        error_pos = at >= 0 ? at : pos;
    }

    char peek() const { return pos < n ? text[pos] : '\0'; }

    bool starts_with(const char* s) const {
        Py_ssize_t len = static_cast<Py_ssize_t>(strlen(s));
        return pos + len <= n && memcmp(text + pos, s, len) == 0;
    }

    static bool is_hex(char c) {
        return (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
               (c >= 'A' && c <= 'F');
    }

    static bool is_ws(unsigned char c) {
        return c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
               c == '\f' || c == '\v';
    }

    void skip_ws() {
        while (pos < n && !failed) {
            unsigned char c = text[pos];
            if (is_ws(c)) {
                pos++;
            } else if (c == 0xC2 && pos + 1 < n &&
                       static_cast<unsigned char>(text[pos + 1]) == 0xA0) {
                pos += 2;  // NBSP
            } else if (c == 0xEF && pos + 2 < n &&
                       static_cast<unsigned char>(text[pos + 1]) == 0xBB &&
                       static_cast<unsigned char>(text[pos + 2]) == 0xBF) {
                pos += 3;  // BOM
            } else if (c == '/' && pos + 1 < n) {
                char nxt = text[pos + 1];
                if (nxt == '/') {
                    pos += 2;
                    while (pos < n && text[pos] != '\n') pos++;
                    if (pos < n) pos++;
                } else if (nxt == '*') {
                    Py_ssize_t end = -1;
                    for (Py_ssize_t i = pos + 2; i + 1 < n; i++) {
                        if (text[i] == '*' && text[i + 1] == '/') { end = i; break; }
                    }
                    if (end < 0) { fail("unterminated block comment"); return; }
                    pos = end + 2;
                } else {
                    return;
                }
            } else {
                return;
            }
        }
    }

    // append a unicode code point as UTF-8 to out
    static void push_utf8(std::string& out, uint32_t cp) {
        if (cp < 0x80) {
            out.push_back(static_cast<char>(cp));
        } else if (cp < 0x800) {
            out.push_back(static_cast<char>(0xC0 | (cp >> 6)));
            out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
        } else if (cp < 0x10000) {
            out.push_back(static_cast<char>(0xE0 | (cp >> 12)));
            out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
            out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
        } else {
            out.push_back(static_cast<char>(0xF0 | (cp >> 18)));
            out.push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
            out.push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
            out.push_back(static_cast<char>(0x80 | (cp & 0x3F)));
        }
    }

    int hex4(Py_ssize_t at) {
        if (at + 4 > n) return -1;
        int v = 0;
        for (int i = 0; i < 4; i++) {
            char c = text[at + i];
            if (!is_hex(c)) return -1;
            v = v * 16 + (c <= '9' ? c - '0'
                          : (c | 0x20) - 'a' + 10);
        }
        return v;
    }

    PyObject* parse_value() {
        skip_ws();
        if (failed) return nullptr;
        if (pos >= n) { fail("unexpected end of input, expected a value"); return nullptr; }
        char c = text[pos];
        if (c == '{') return parse_object();
        if (c == '[') return parse_array();
        if (c == '"' || c == '\'') return parse_string();
        if ((c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.')
            return parse_number();
        if (starts_with("true")) { pos += 4; Py_RETURN_TRUE; }
        if (starts_with("false")) { pos += 5; Py_RETURN_FALSE; }
        if (starts_with("null")) { pos += 4; Py_RETURN_NONE; }
        if (starts_with("Infinity")) { pos += 8; return PyFloat_FromDouble(Py_HUGE_VAL); }
        if (starts_with("NaN")) { pos += 3; return PyFloat_FromDouble(Py_NAN); }
        fail(std::string("unexpected character '") + c + "'");
        return nullptr;
    }

    PyObject* parse_object() {
        pos++;  // '{'
        PyObject* obj = PyDict_New();
        if (!obj) { fail("alloc"); return nullptr; }
        for (;;) {
            skip_ws();
            if (failed || pos >= n) { fail("unterminated object"); Py_DECREF(obj); return nullptr; }
            if (text[pos] == '}') { pos++; return obj; }
            PyObject* key = parse_key();
            if (!key) { Py_DECREF(obj); return nullptr; }
            skip_ws();
            if (peek() != ':') {
                fail("expected ':' after object key");
                Py_DECREF(key); Py_DECREF(obj); return nullptr;
            }
            pos++;
            PyObject* value = parse_value();
            if (!value) { Py_DECREF(key); Py_DECREF(obj); return nullptr; }
            if (PyDict_SetItem(obj, key, value) < 0) {
                Py_DECREF(key); Py_DECREF(value); Py_DECREF(obj);
                fail("dict set failed"); return nullptr;
            }
            Py_DECREF(key); Py_DECREF(value);
            skip_ws();
            char cc = peek();
            if (cc == ',') { pos++; }
            else if (cc == '}') { pos++; return obj; }
            else if (cc == '\0') { fail("unterminated object"); Py_DECREF(obj); return nullptr; }
            else {
                fail(std::string("expected ',' or '}' in object, got '") + cc + "'");
                Py_DECREF(obj); return nullptr;
            }
        }
    }

    PyObject* parse_key() {
        char c = peek();
        if (c == '"' || c == '\'') return parse_string();
        std::string out;
        Py_ssize_t start = pos;
        while (pos < n) {
            unsigned char uc = text[pos];
            if (uc == '\\' && starts_with("\\u")) {
                int v = hex4(pos + 2);
                if (v < 0) { fail("invalid \\u escape in identifier"); return nullptr; }
                push_utf8(out, static_cast<uint32_t>(v));
                pos += 6;
                continue;
            }
            bool is_first = (pos == start) && out.empty();
            bool ascii_alpha = (uc >= 'a' && uc <= 'z') || (uc >= 'A' && uc <= 'Z');
            bool ascii_digit = (uc >= '0' && uc <= '9');
            bool extra = uc == '$' || uc == '_';
            bool multibyte = uc >= 0x80;  // accept non-ASCII letters wholesale
            bool ok = ascii_alpha || extra || multibyte ||
                      (!is_first && ascii_digit);
            if (!ok) break;
            if (multibyte) {
                // copy the full UTF-8 sequence
                int len = (uc >= 0xF0) ? 4 : (uc >= 0xE0) ? 3 : 2;
                for (int i = 0; i < len && pos < n; i++) out.push_back(text[pos++]);
            } else {
                out.push_back(static_cast<char>(uc));
                pos++;
            }
        }
        if (out.empty()) { fail("expected object key"); return nullptr; }
        return PyUnicode_DecodeUTF8(out.data(), out.size(), "replace");
    }

    PyObject* parse_array() {
        pos++;  // '['
        PyObject* arr = PyList_New(0);
        if (!arr) { fail("alloc"); return nullptr; }
        for (;;) {
            skip_ws();
            if (failed || pos >= n) { fail("unterminated array"); Py_DECREF(arr); return nullptr; }
            if (text[pos] == ']') { pos++; return arr; }
            PyObject* value = parse_value();
            if (!value) { Py_DECREF(arr); return nullptr; }
            if (PyList_Append(arr, value) < 0) {
                Py_DECREF(value); Py_DECREF(arr); fail("append failed"); return nullptr;
            }
            Py_DECREF(value);
            skip_ws();
            char cc = peek();
            if (cc == ',') { pos++; }
            else if (cc == ']') { pos++; return arr; }
            else if (cc == '\0') { fail("unterminated array"); Py_DECREF(arr); return nullptr; }
            else {
                fail(std::string("expected ',' or ']' in array, got '") + cc + "'");
                Py_DECREF(arr); return nullptr;
            }
        }
    }

    PyObject* parse_string() {
        char quote = text[pos];
        pos++;
        std::string out;
        while (true) {
            if (pos >= n) { fail("unterminated string"); return nullptr; }
            unsigned char c = text[pos];
            if (c == static_cast<unsigned char>(quote)) {
                pos++;
                return PyUnicode_DecodeUTF8(out.data(), out.size(), "replace");
            }
            if (c == '\n' || c == '\r') { fail("unescaped newline in string"); return nullptr; }
            if (c != '\\') { out.push_back(static_cast<char>(c)); pos++; continue; }
            if (pos + 1 >= n) { fail("unterminated escape sequence"); return nullptr; }
            char e = text[pos + 1];
            switch (e) {
                case 'u': {
                    int v = hex4(pos + 2);
                    if (v < 0) { fail("invalid \\u escape"); return nullptr; }
                    uint32_t cp = static_cast<uint32_t>(v);
                    pos += 6;
                    if (cp >= 0xD800 && cp <= 0xDBFF && starts_with("\\u")) {
                        int lo = hex4(pos + 2);
                        if (lo >= 0xDC00 && lo <= 0xDFFF) {
                            cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
                            pos += 6;
                        }
                    }
                    push_utf8(out, cp);
                    break;
                }
                case 'x': {
                    if (pos + 4 > n || !is_hex(text[pos + 2]) || !is_hex(text[pos + 3])) {
                        fail("invalid \\x escape"); return nullptr;
                    }
                    int hi = text[pos + 2] <= '9' ? text[pos + 2] - '0'
                             : (text[pos + 2] | 0x20) - 'a' + 10;
                    int lo = text[pos + 3] <= '9' ? text[pos + 3] - '0'
                             : (text[pos + 3] | 0x20) - 'a' + 10;
                    push_utf8(out, static_cast<uint32_t>(hi * 16 + lo));
                    pos += 4;
                    break;
                }
                case 'b': out.push_back('\b'); pos += 2; break;
                case 'f': out.push_back('\f'); pos += 2; break;
                case 'n': out.push_back('\n'); pos += 2; break;
                case 'r': out.push_back('\r'); pos += 2; break;
                case 't': out.push_back('\t'); pos += 2; break;
                case 'v': out.push_back('\v'); pos += 2; break;
                case '0': out.push_back('\0'); pos += 2; break;
                case '\n': pos += 2; break;  // line continuation
                case '\r':
                    pos += 2;
                    if (pos < n && text[pos] == '\n') pos++;
                    break;
                default:
                    if (e >= '1' && e <= '9') { fail("invalid numeric escape"); return nullptr; }
                    out.push_back(e);
                    pos += 2;
            }
        }
    }

    PyObject* parse_number() {
        Py_ssize_t start = pos;
        int sign = 1;
        char c = text[pos];
        if (c == '+' || c == '-') {
            sign = (c == '-') ? -1 : 1;
            pos++;
            if (starts_with("Infinity")) {
                pos += 8;
                return PyFloat_FromDouble(sign * Py_HUGE_VAL);
            }
            if (starts_with("NaN")) { pos += 3; return PyFloat_FromDouble(Py_NAN); }
        }
        if (pos + 1 < n && text[pos] == '0' &&
            (text[pos + 1] == 'x' || text[pos + 1] == 'X')) {
            pos += 2;
            Py_ssize_t h0 = pos;
            while (pos < n && is_hex(text[pos])) pos++;
            if (pos == h0) { fail("invalid hex literal"); return nullptr; }
            std::string digits(text + h0, pos - h0);
            PyObject* v = PyLong_FromString(digits.c_str(), nullptr, 16);
            if (!v) { fail("invalid hex literal"); return nullptr; }
            if (sign < 0) {
                PyObject* neg = PyNumber_Negative(v);
                Py_DECREF(v);
                return neg;
            }
            return v;
        }
        bool is_float = false;
        while (pos < n) {
            char cc = text[pos];
            if (cc >= '0' && cc <= '9') { pos++; }
            else if (cc == '.' && !is_float) { is_float = true; pos++; }
            else if (cc == 'e' || cc == 'E') {
                is_float = true;
                pos++;
                if (pos < n && (text[pos] == '+' || text[pos] == '-')) pos++;
            } else break;
        }
        std::string literal(text + start, pos - start);
        if (literal.empty() || literal == "+" || literal == "-" ||
            literal == "." || literal == "+." || literal == "-.") {
            fail("invalid number literal", start);
            return nullptr;
        }
        if (is_float) {
            char* endp = nullptr;
            double d = PyOS_string_to_double(literal.c_str(), &endp, nullptr);
            if (endp != literal.c_str() + literal.size()) {
                fail("invalid number literal", start);
                return nullptr;
            }
            return PyFloat_FromDouble(d);
        }
        PyObject* v = PyLong_FromString(literal.c_str(), nullptr, 10);
        if (!v) { PyErr_Clear(); fail("invalid number literal", start); return nullptr; }
        return v;
    }
};

PyObject* json5c_loads(PyObject*, PyObject* args) {
    const char* text;
    Py_ssize_t len;
    if (!PyArg_ParseTuple(args, "s#", &text, &len)) return nullptr;

    Parser p(text, len);
    PyObject* value = p.parse_value();
    if (value && !p.failed) {
        p.skip_ws();
        if (p.pos != p.n) {
            Py_DECREF(value);
            value = nullptr;
            p.fail("trailing characters after top-level value");
        }
    }
    if (!value || p.failed) {
        Py_XDECREF(value);
        // compute line/col for the error message
        Py_ssize_t line = 1, last_nl = -1;
        for (Py_ssize_t i = 0; i < p.error_pos && i < p.n; i++) {
            if (p.text[i] == '\n') { line++; last_nl = i; }
        }
        Py_ssize_t col = p.error_pos - last_nl;
        if (!PyErr_Occurred()) {
            PyErr_Format(PyExc_ValueError,
                         "JSON5 parse error at line %zd, column %zd: %s",
                         line, col, p.error.c_str());
        }
        return nullptr;
    }
    return value;
}

PyMethodDef methods[] = {
    {"loads", json5c_loads, METH_VARARGS,
     "Parse a JSON5 document (native implementation)."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "json5c", "Native JSON5 parser", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_json5c(void) {
    return PyModule_Create(&module);
}
