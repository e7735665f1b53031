"""Standalone CPython-3.7 .pyc disassembler (runs on any modern Python).

The reference ships bytecode of DELETED modules (``/root/reference/
__pycache__/train_slowfast.cpython-37.pyc`` — the SlowFast-era training
loop whose source was removed; SURVEY §2.5). Modern interpreters cannot
unmarshal 3.7 code objects, so this reimplements just enough of the 3.7
marshal format and opcode table to produce a readable disassembly for
documenting those semantics (see docs/SLOWFAST.md).

Usage:  python tools/py37_disasm.py path/to/file.cpython-37.pyc
"""

from __future__ import annotations

import struct
import sys

# ---- CPython 3.7 opcode table (Lib/opcode.py @ v3.7) ---------------------

OPNAMES = {}


def _op(name, code):
    OPNAMES[code] = name


for name, code in [
    ("POP_TOP", 1), ("ROT_TWO", 2), ("ROT_THREE", 3), ("DUP_TOP", 4),
    ("DUP_TOP_TWO", 5), ("NOP", 9), ("UNARY_POSITIVE", 10),
    ("UNARY_NEGATIVE", 11), ("UNARY_NOT", 12), ("UNARY_INVERT", 15),
    ("BINARY_MATRIX_MULTIPLY", 16), ("INPLACE_MATRIX_MULTIPLY", 17),
    ("BINARY_POWER", 19), ("BINARY_MULTIPLY", 20), ("BINARY_MODULO", 22),
    ("BINARY_ADD", 23), ("BINARY_SUBTRACT", 24), ("BINARY_SUBSCR", 25),
    ("BINARY_FLOOR_DIVIDE", 26), ("BINARY_TRUE_DIVIDE", 27),
    ("INPLACE_FLOOR_DIVIDE", 28), ("INPLACE_TRUE_DIVIDE", 29),
    ("GET_AITER", 50), ("GET_ANEXT", 51), ("BEFORE_ASYNC_WITH", 52),
    ("INPLACE_ADD", 55), ("INPLACE_SUBTRACT", 56), ("INPLACE_MULTIPLY", 57),
    ("INPLACE_MODULO", 59), ("STORE_SUBSCR", 60), ("DELETE_SUBSCR", 61),
    ("BINARY_LSHIFT", 62), ("BINARY_RSHIFT", 63), ("BINARY_AND", 64),
    ("BINARY_XOR", 65), ("BINARY_OR", 66), ("INPLACE_POWER", 67),
    ("GET_ITER", 68), ("GET_YIELD_FROM_ITER", 69), ("PRINT_EXPR", 70),
    ("LOAD_BUILD_CLASS", 71), ("YIELD_FROM", 72), ("GET_AWAITABLE", 73),
    ("INPLACE_LSHIFT", 75), ("INPLACE_RSHIFT", 76), ("INPLACE_AND", 77),
    ("INPLACE_XOR", 78), ("INPLACE_OR", 79), ("BREAK_LOOP", 80),
    ("WITH_CLEANUP_START", 81), ("WITH_CLEANUP_FINISH", 82),
    ("RETURN_VALUE", 83), ("IMPORT_STAR", 84), ("SETUP_ANNOTATIONS", 85),
    ("YIELD_VALUE", 86), ("POP_BLOCK", 87), ("END_FINALLY", 88),
    ("POP_EXCEPT", 89),
    ("STORE_NAME", 90), ("DELETE_NAME", 91), ("UNPACK_SEQUENCE", 92),
    ("FOR_ITER", 93), ("UNPACK_EX", 94), ("STORE_ATTR", 95),
    ("DELETE_ATTR", 96), ("STORE_GLOBAL", 97), ("DELETE_GLOBAL", 98),
    ("LOAD_CONST", 100), ("LOAD_NAME", 101), ("BUILD_TUPLE", 102),
    ("BUILD_LIST", 103), ("BUILD_SET", 104), ("BUILD_MAP", 105),
    ("LOAD_ATTR", 106), ("COMPARE_OP", 107), ("IMPORT_NAME", 108),
    ("IMPORT_FROM", 109), ("JUMP_FORWARD", 110),
    ("JUMP_IF_FALSE_OR_POP", 111), ("JUMP_IF_TRUE_OR_POP", 112),
    ("JUMP_ABSOLUTE", 113), ("POP_JUMP_IF_FALSE", 114),
    ("POP_JUMP_IF_TRUE", 115), ("LOAD_GLOBAL", 116), ("CONTINUE_LOOP", 119),
    ("SETUP_LOOP", 120), ("SETUP_EXCEPT", 121), ("SETUP_FINALLY", 122),
    ("LOAD_FAST", 124), ("STORE_FAST", 125), ("DELETE_FAST", 126),
    ("RAISE_VARARGS", 130), ("CALL_FUNCTION", 131), ("MAKE_FUNCTION", 132),
    ("BUILD_SLICE", 133), ("LOAD_CLOSURE", 135), ("LOAD_DEREF", 136),
    ("STORE_DEREF", 137), ("DELETE_DEREF", 138), ("CALL_FUNCTION_KW", 141),
    ("CALL_FUNCTION_EX", 142), ("SETUP_WITH", 143), ("EXTENDED_ARG", 144),
    ("LIST_APPEND", 145), ("SET_ADD", 146), ("MAP_ADD", 147),
    ("LOAD_CLASSDEREF", 148), ("BUILD_LIST_UNPACK", 149),
    ("BUILD_MAP_UNPACK", 150), ("BUILD_MAP_UNPACK_WITH_CALL", 151),
    ("BUILD_TUPLE_UNPACK", 152), ("BUILD_SET_UNPACK", 153),
    ("SETUP_ASYNC_WITH", 154), ("FORMAT_VALUE", 155),
    ("BUILD_CONST_KEY_MAP", 156), ("BUILD_STRING", 157),
    ("BUILD_TUPLE_UNPACK_WITH_CALL", 158), ("LOAD_METHOD", 160),
    ("CALL_METHOD", 161),
]:
    _op(name, code)

HAVE_ARGUMENT = 90
CMP_OPS = ("<", "<=", "==", "!=", ">", ">=", "in", "not in", "is",
           "is not", "exception match", "BAD")
NAME_OPS = {"STORE_NAME", "DELETE_NAME", "STORE_ATTR", "DELETE_ATTR",
            "STORE_GLOBAL", "DELETE_GLOBAL", "LOAD_NAME", "LOAD_ATTR",
            "IMPORT_NAME", "IMPORT_FROM", "LOAD_GLOBAL", "LOAD_METHOD"}
LOCAL_OPS = {"LOAD_FAST", "STORE_FAST", "DELETE_FAST"}
CONST_OPS = {"LOAD_CONST"}
FREE_OPS = {"LOAD_CLOSURE", "LOAD_DEREF", "STORE_DEREF", "DELETE_DEREF",
            "LOAD_CLASSDEREF"}
JREL_OPS = {"FOR_ITER", "JUMP_FORWARD", "SETUP_LOOP", "SETUP_EXCEPT",
            "SETUP_FINALLY", "SETUP_WITH", "SETUP_ASYNC_WITH"}


class Code37:
    """Plain-data stand-in for a 3.7 code object."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


class Unmarshal37:
    """Reader for the CPython 3.7 marshal stream (r_object subset used by
    .pyc files)."""

    def __init__(self, data: bytes):
        self.d = data
        self.p = 0
        self.refs = []

    def _read(self, n):
        b = self.d[self.p:self.p + n]
        self.p += n
        return b

    def _int32(self):
        return struct.unpack("<i", self._read(4))[0]

    def _byte(self):
        return self._read(1)[0]

    def load(self):
        t = self._byte()
        flag_ref = bool(t & 0x80)
        t = chr(t & 0x7F)

        def keep(obj):
            if flag_ref:
                self.refs.append(obj)
            return obj

        if t == "0":
            return None
        if t == "N":
            return None
        if t == "F":
            return keep(False)
        if t == "T":
            return keep(True)
        if t == "S":
            return keep(StopIteration)
        if t == ".":
            return keep(Ellipsis)
        if t == "i":
            return keep(self._int32())
        if t == "g":
            return keep(struct.unpack("<d", self._read(8))[0])
        if t == "y":
            re_, im = struct.unpack("<dd", self._read(16))
            return keep(complex(re_, im))
        if t == "l":  # arbitrary-precision int, 15-bit digits
            n = self._int32()
            sign = -1 if n < 0 else 1
            n = abs(n)
            val = 0
            for i in range(n):
                val |= struct.unpack("<H", self._read(2))[0] << (15 * i)
            return keep(sign * val)
        if t == "s":  # bytes
            n = self._int32()
            return keep(self._read(n))
        if t in ("u", "t", "a", "A"):  # utf8 strings (t/A interned)
            n = self._int32()
            return keep(self._read(n).decode("utf-8", "replace"))
        if t in ("z", "Z"):  # short ascii
            n = self._byte()
            return keep(self._read(n).decode("ascii", "replace"))
        if t == "r":
            return self.refs[self._int32()]
        if t in ("(", ")", "[", "<", ">"):
            n = self._byte() if t == ")" else self._int32()
            # container: CPython reserves the ref slot BEFORE children
            slot = None
            if flag_ref:
                slot = len(self.refs)
                self.refs.append(None)
            items = [self.load() for _ in range(n)]
            obj = items if t == "[" else tuple(items)
            if t == "<":
                obj = set(items)
            if t == ">":
                obj = frozenset(items)
            if slot is not None:
                self.refs[slot] = obj
            return obj
        if t == "{":
            slot = None
            if flag_ref:
                slot = len(self.refs)
                self.refs.append(None)
            obj = {}
            while True:
                k = self.load()
                if k is None:
                    break
                obj[k] = self.load()
            if slot is not None:
                self.refs[slot] = obj
            return obj
        if t == "c":
            slot = None
            if flag_ref:
                slot = len(self.refs)
                self.refs.append(None)
            co = Code37(
                argcount=self._int32(),
                kwonlyargcount=self._int32(),
                nlocals=self._int32(),
                stacksize=self._int32(),
                flags=self._int32(),
                code=self.load(),
                consts=self.load(),
                names=self.load(),
                varnames=self.load(),
                freevars=self.load(),
                cellvars=self.load(),
                filename=self.load(),
                name=self.load(),
                firstlineno=self._int32(),
                lnotab=self.load(),
            )
            if slot is not None:
                self.refs[slot] = co
            return co
        raise ValueError(f"unhandled marshal type {t!r} at {self.p}")


def _lines_from_lnotab(co) -> dict:
    """offset -> source line (3.7 lnotab encoding, signed line deltas)."""
    out = {}
    line = co.firstlineno
    addr = 0
    out[0] = line
    tab = co.lnotab
    for i in range(0, len(tab), 2):
        a, l = tab[i], tab[i + 1]
        if l >= 0x80:
            l -= 0x100
        addr += a
        line += l
        out[addr] = line
    return out


def disassemble(co, out, depth=0):
    ind = "  " * depth
    args = ", ".join(co.varnames[: co.argcount])
    print(f"{ind}### {co.name}({args})  "
          f"[file {co.filename}:{co.firstlineno}]", file=out)
    lines = _lines_from_lnotab(co)
    code = co.code
    ext = 0
    for off in range(0, len(code), 2):
        op, arg = code[off], code[off + 1]
        name = OPNAMES.get(op, f"<op {op}>")
        if name == "EXTENDED_ARG":
            ext = (ext | arg) << 8
            continue
        arg |= ext
        ext = 0
        detail = ""
        if op >= HAVE_ARGUMENT:
            detail = str(arg)
            try:
                if name in CONST_OPS:
                    c = co.consts[arg]
                    detail += f" ({c.name if isinstance(c, Code37) else c!r})"
                elif name in NAME_OPS:
                    detail += f" ({co.names[arg]})"
                elif name in LOCAL_OPS:
                    detail += f" ({co.varnames[arg]})"
                elif name in FREE_OPS:
                    cell = tuple(co.cellvars) + tuple(co.freevars)
                    detail += f" ({cell[arg]})"
                elif name == "COMPARE_OP":
                    detail += f" ({CMP_OPS[arg]})"
                elif name in JREL_OPS:
                    detail += f" (to {off + 2 + arg})"
            except Exception:
                detail += " (?)"
        mark = f"L{lines[off]:<4}" if off in lines else "     "
        print(f"{ind}{mark} {off:>5} {name:<28}{detail}", file=out)
    for c in co.consts:
        if isinstance(c, Code37):
            disassemble(c, out, depth + 1)


def main(argv):
    path = argv[1]
    data = open(path, "rb").read()
    # 3.7 pyc header: magic(4) flags(4) mtime(4) size(4)
    assert data[:2] == b"\x42\x0d", "not a cpython-3.7 pyc"
    co = Unmarshal37(data[16:]).load()
    disassemble(co, sys.stdout)


if __name__ == "__main__":
    main(sys.argv)
