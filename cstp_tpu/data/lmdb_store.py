"""Dependency-free LMDB access for the reference's video shards.

The reference stores Kinetics-400/UCF-101 as LMDB environments whose values
are msgpack'd lists of raw JPEG bytes, keyed ``b'%09d'`` by shuffled video id
with meta keys ``__keys__`` / ``__len__`` / ``__order__`` / ``__vlen__``
(``/root/reference/utils_dir/make_lmdb_kin.py:49-88``, read at
``/root/reference/data_process/datasets.py:502-534``). The ``lmdb`` C binding
is not part of this framework's dependency set, so this module implements the
LMDB on-disk B+tree format directly:

* :class:`LMDBReader` — read-only, mmap-based. Parses the dual meta pages,
  walks branch pages to leaves, follows overflow pages for big values.
  Enough of the format (64-bit, little-endian, default page layout) to read
  anything the reference tooling produces.
* :func:`write_lmdb` — a minimal single-transaction writer producing a valid
  LMDB file (sorted bulk load, bottom-up B+tree). Used by the pack CLI and
  tests; files it writes are readable by the real liblmdb.

Format reference: LMDB (OpenLDAP) mdb.c on-disk structs — MDB_page /
MDB_node / MDB_meta / MDB_db. All offsets below are the 64-bit layout.
"""

from __future__ import annotations

import mmap
import os
import struct
from typing import Dict, Iterator, List, Optional, Tuple

MDB_MAGIC = 0xBEEFC0DE
MDB_DATA_VERSION = 1

P_BRANCH = 0x01
P_LEAF = 0x02
P_OVERFLOW = 0x04
P_META = 0x08
P_LEAF2 = 0x20

F_BIGDATA = 0x01

PAGEHDRSZ = 16
_INVALID_PG = 0xFFFFFFFFFFFFFFFF

# MDB_db: md_pad u32, md_flags u16, md_depth u16, md_branch_pages u64,
# md_leaf_pages u64, md_overflow_pages u64, md_entries u64, md_root u64
_DB_FMT = "<IHHQQQQQ"
_DB_SIZE = struct.calcsize(_DB_FMT)  # 48
# MDB_meta: mm_magic u32, mm_version u32, mm_address u64, mm_mapsize u64,
# mm_dbs[2], mm_last_pg u64, mm_txnid u64
_META_HEAD = "<IIQQ"


def _even(n: int) -> int:
    return (n + 1) & ~1


class _Db:
    __slots__ = ("pad", "flags", "depth", "branch_pages", "leaf_pages",
                 "overflow_pages", "entries", "root")

    def __init__(self, raw: bytes):
        (self.pad, self.flags, self.depth, self.branch_pages, self.leaf_pages,
         self.overflow_pages, self.entries, self.root) = struct.unpack(
            _DB_FMT, raw)


class LMDBReader:
    """Read-only LMDB main-database accessor over an mmap.

    ``path`` may be the environment directory (containing ``data.mdb``, the
    ``subdir=True`` layout the reference uses) or the data file itself.
    """

    def __init__(self, path: str):
        if os.path.isdir(path):
            path = os.path.join(path, "data.mdb")
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        meta0 = self._parse_meta(0)
        self.psize = meta0[0].pad  # mm_psize aliases mm_dbs[0].md_pad
        meta1 = self._parse_meta(self.psize)
        # live meta = larger txnid (mdb_env_pick_meta)
        self.main = meta1[1] if meta1[2] >= meta0[2] else meta0[1]

    def _parse_meta(self, off: int) -> Tuple[_Db, _Db, int]:
        # skip the 16-byte page header
        base = off + PAGEHDRSZ
        magic, version, _addr, _mapsize = struct.unpack_from(_META_HEAD,
                                                             self._mm, base)
        if magic != MDB_MAGIC:
            raise ValueError(f"not an LMDB file (magic {magic:#x})")
        if version != MDB_DATA_VERSION:
            raise ValueError(f"unsupported LMDB data version {version}")
        base += struct.calcsize(_META_HEAD)
        free_db = _Db(self._mm[base : base + _DB_SIZE])
        main_db = _Db(self._mm[base + _DB_SIZE : base + 2 * _DB_SIZE])
        _last_pg, txnid = struct.unpack_from("<QQ", self._mm,
                                             base + 2 * _DB_SIZE)
        return free_db, main_db, txnid

    # -- page parsing -------------------------------------------------------

    def _page(self, pgno: int) -> Tuple[int, int, int, int]:
        """Return (base_offset, flags, lower, upper) of page ``pgno``."""
        base = pgno * self.psize
        flags, lower, upper = struct.unpack_from("<HHH", self._mm, base + 10)
        return base, flags, lower, upper

    def _node(self, base: int, ptr: int) -> Tuple[int, int, int, int]:
        """Node at page ``base`` + ``ptr``: (lo, hi, flags, ksize)."""
        return struct.unpack_from("<HHHH", self._mm, base + ptr)

    def _numkeys(self, lower: int) -> int:
        return (lower - PAGEHDRSZ) >> 1

    def _ptrs(self, base: int, n: int) -> Tuple[int, ...]:
        return struct.unpack_from(f"<{n}H", self._mm, base + PAGEHDRSZ)

    def _key_at(self, base: int, ptr: int) -> bytes:
        _lo, _hi, _fl, ksize = self._node(base, ptr)
        return bytes(self._mm[base + ptr + 8 : base + ptr + 8 + ksize])

    def _leaf_value(self, base: int, ptr: int) -> bytes:
        lo, hi, fl, ksize = self._node(base, ptr)
        dsize = lo | (hi << 16)
        dstart = base + ptr + 8 + ksize
        if fl & F_BIGDATA:
            (ov_pgno,) = struct.unpack_from("<Q", self._mm, dstart)
            ov_base = ov_pgno * self.psize
            # overflow data runs contiguously from the first page's body
            return bytes(self._mm[ov_base + PAGEHDRSZ
                                  : ov_base + PAGEHDRSZ + dsize])
        return bytes(self._mm[dstart : dstart + dsize])

    # -- lookup -------------------------------------------------------------

    def get(self, key: bytes) -> Optional[bytes]:
        if self.main.root == _INVALID_PG:
            return None
        pgno = self.main.root
        for _ in range(self.main.depth):
            base, flags, lower, _upper = self._page(pgno)
            n = self._numkeys(lower)
            ptrs = self._ptrs(base, n)
            if flags & P_BRANCH:
                # descend into the rightmost child whose key <= target;
                # node[0]'s key is ignored (acts as -inf)
                lo_i, hi_i = 1, n - 1
                child = 0
                while lo_i <= hi_i:
                    mid = (lo_i + hi_i) // 2
                    if self._key_at(base, ptrs[mid]) <= key:
                        child = mid
                        lo_i = mid + 1
                    else:
                        hi_i = mid - 1
                nlo, nhi, nfl, _ks = self._node(base, ptrs[child])
                pgno = nlo | (nhi << 16) | (nfl << 32)
            elif flags & P_LEAF:
                lo_i, hi_i = 0, n - 1
                while lo_i <= hi_i:
                    mid = (lo_i + hi_i) // 2
                    k = self._key_at(base, ptrs[mid])
                    if k == key:
                        return self._leaf_value(base, ptrs[mid])
                    if k < key:
                        lo_i = mid + 1
                    else:
                        hi_i = mid - 1
                return None
            else:  # pragma: no cover
                raise ValueError(f"unexpected page flags {flags:#x}")
        return None

    def __getitem__(self, key: bytes) -> bytes:
        v = self.get(key)
        if v is None:
            raise KeyError(key)
        return v

    def __len__(self) -> int:
        return self.main.entries

    def items(self) -> Iterator[Tuple[bytes, bytes]]:
        """In-order scan of the main DB (DFS; LMDB pages carry no sibling
        links, so iteration walks the tree)."""
        if self.main.root == _INVALID_PG:
            return
        yield from self._walk(self.main.root)

    def _walk(self, pgno: int) -> Iterator[Tuple[bytes, bytes]]:
        base, flags, lower, _upper = self._page(pgno)
        n = self._numkeys(lower)
        ptrs = self._ptrs(base, n)
        if flags & P_BRANCH:
            for ptr in ptrs:
                nlo, nhi, nfl, _ks = self._node(base, ptr)
                yield from self._walk(nlo | (nhi << 16) | (nfl << 32))
        elif flags & P_LEAF:
            for ptr in ptrs:
                yield self._key_at(base, ptr), self._leaf_value(base, ptr)

    def close(self):
        self._mm.close()
        self._f.close()


def write_lmdb(path: str, items: Dict[bytes, bytes],
               psize: int = 4096, subdir: bool = False) -> str:
    """Write ``items`` as a fresh single-txn LMDB environment.

    Sorted bulk load, bottom-up: values too large to inline go to overflow
    pages (F_BIGDATA), leaves pack sorted nodes, branch levels are built on
    top until a single root remains. Produces the same structures liblmdb
    itself would for a one-transaction load. Returns the data-file path.
    """
    if subdir:
        os.makedirs(path, exist_ok=True)
        data_path = os.path.join(path, "data.mdb")
    else:
        data_path = path
    entries = sorted(items.items())
    pages: Dict[int, bytes] = {}
    next_pg = 2
    stats = {"branch": 0, "leaf": 0, "overflow": 0}

    def alloc(n: int = 1) -> int:
        nonlocal next_pg
        p = next_pg
        next_pg += n
        return p

    def page_bytes(pgno: int, flags: int, nodes: List[bytes]) -> bytes:
        """Assemble a branch/leaf page: ptr array at the front (key order),
        node bodies packed downward from the page end."""
        buf = bytearray(psize)
        upper = psize
        ptrs = []
        for node in nodes:
            upper -= _even(len(node))
            buf[upper : upper + len(node)] = node
            ptrs.append(upper)
        lower = PAGEHDRSZ + 2 * len(nodes)
        assert lower <= upper, "page overflow"
        struct.pack_into("<QHHHH", buf, 0, pgno, 0, flags, lower, upper)
        struct.pack_into(f"<{len(ptrs)}H", buf, PAGEHDRSZ, *ptrs)
        return bytes(buf)

    # an inline node must fit a page comfortably; liblmdb's cutoff is
    # roughly psize/2 minus overhead — anything bigger goes to overflow
    max_inline = (psize - PAGEHDRSZ) // 2 - 16

    def leaf_node(key: bytes, val: bytes) -> bytes:
        if 8 + len(key) + len(val) > max_inline:
            npages = (len(val) + PAGEHDRSZ + psize - 1) // psize
            ov = alloc(npages)
            stats["overflow"] += npages
            blob = bytearray(npages * psize)
            struct.pack_into("<QHHI", blob, 0, ov, 0, P_OVERFLOW, npages)
            blob[PAGEHDRSZ : PAGEHDRSZ + len(val)] = val
            pages[ov] = bytes(blob)
            body = struct.pack("<HHHH", len(val) & 0xFFFF, len(val) >> 16,
                               F_BIGDATA, len(key)) + key + struct.pack("<Q", ov)
        else:
            body = struct.pack("<HHHH", len(val) & 0xFFFF, len(val) >> 16,
                               0, len(key)) + key + val
        return body

    def branch_node(key: bytes, child_pg: int) -> bytes:
        return struct.pack("<HHHH", child_pg & 0xFFFF,
                           (child_pg >> 16) & 0xFFFF,
                           (child_pg >> 32) & 0xFFFF, len(key)) + key

    # --- leaves ---
    level: List[Tuple[bytes, int]] = []  # (first_key, pgno)
    cap = psize - PAGEHDRSZ
    cur: List[bytes] = []
    cur_keys: List[bytes] = []
    cur_size = 0

    def flush_leaf():
        nonlocal cur, cur_keys, cur_size
        if not cur:
            return
        pg = alloc()
        stats["leaf"] += 1
        pages[pg] = page_bytes(pg, P_LEAF, cur)
        level.append((cur_keys[0], pg))
        cur, cur_keys, cur_size = [], [], 0

    for key, val in entries:
        node = leaf_node(key, val)
        cost = 2 + _even(len(node))
        if cur and cur_size + cost > cap:
            flush_leaf()
        cur.append(node)
        cur_keys.append(key)
        cur_size += cost
    flush_leaf()

    # --- branches, bottom-up ---
    depth = 1
    while len(level) > 1:
        depth += 1
        nxt: List[Tuple[bytes, int]] = []
        cur, cur_keys, cur_size = [], [], 0

        def flush_branch():
            nonlocal cur, cur_keys, cur_size
            if not cur:
                return
            pg = alloc()
            stats["branch"] += 1
            pages[pg] = page_bytes(pg, P_BRANCH, cur)
            nxt.append((cur_keys[0], pg))
            cur, cur_keys, cur_size = [], [], 0

        for key, child in level:
            node = branch_node(key, child)
            cost = 2 + _even(len(node))
            if cur and cur_size + cost > cap:
                flush_branch()
            cur.append(node)
            cur_keys.append(key)
            cur_size += cost
        flush_branch()
        level = nxt

    root = level[0][1] if level else _INVALID_PG
    if not entries:
        depth = 0

    last_pg = next_pg - 1
    file_size = (last_pg + 1) * psize

    def meta_page(pgno: int, txnid: int) -> bytes:
        buf = bytearray(psize)
        struct.pack_into("<QHHHH", buf, 0, pgno, 0, P_META, 0, 0)
        off = PAGEHDRSZ
        struct.pack_into(_META_HEAD, buf, off, MDB_MAGIC, MDB_DATA_VERSION,
                         0, max(file_size, 1 << 20))
        off += struct.calcsize(_META_HEAD)
        # free DB: empty (md_pad carries the env page size)
        struct.pack_into(_DB_FMT, buf, off, psize, 0x08, 0, 0, 0, 0, 0,
                         _INVALID_PG)
        off += _DB_SIZE
        # main DB
        struct.pack_into(_DB_FMT, buf, off, 0, 0, depth, stats["branch"],
                         stats["leaf"], stats["overflow"], len(entries), root)
        off += _DB_SIZE
        struct.pack_into("<QQ", buf, off, last_pg, txnid)
        return bytes(buf)

    with open(data_path, "wb") as f:
        f.write(meta_page(0, 0))
        f.write(meta_page(1, 1))
        # pages are allocated sequentially; a multi-page overflow blob is
        # stored once under its first pgno, so sorted order == file order
        for pg in sorted(pages):
            assert f.tell() == pg * psize, (f.tell(), pg)
            f.write(pages[pg])
    return data_path
