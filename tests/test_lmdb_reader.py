"""Tests for the pure-Python LMDB walker (data/lmdb_reader.py).

The ``lmdb`` package is not in this environment, so fixtures are produced by
a minimal spec-conformant writer below that lays out pages exactly per
liblmdb's mdb.c (same layout facts documented in lmdb_reader.py).  The
writer is test-only and deliberately independent of the reader's code
paths: it computes offsets/structs from the spec, the reader parses them
back; structural constants (header sizes, flag values, meta offsets) are
asserted against the spec values inline so a shared misreading of the
format would have to be consistent across two separate encodings to pass.
If a real ``lmdb`` package is ever present, the roundtrip test
automatically uses it as the writer instead (golden cross-check).
"""

import os
import struct

import pytest

from montage_gan_tpu.data.lmdb_reader import (LMDBFormatError, LMDBReader,
                                              MDB_MAGIC, PAGEHDRSZ)

pytestmark = pytest.mark.quick

PSIZE = 4096


def _even(n):
    return n + (n & 1)


class _Writer:
    """Minimal LMDB environment writer (main DB only, sorted inserts)."""

    def __init__(self, psize=PSIZE):
        self.psize = psize
        self.pages = {}          # pgno -> bytes
        self.next_pgno = 2       # 0/1 are the meta pages

    def _alloc(self, n=1):
        pgno = self.next_pgno
        self.next_pgno += n
        return pgno

    def _page_bytes(self, pgno, flags, nodes):
        """Pack ``nodes`` (list of raw node byte strings, already in key
        order) into one page; returns bytes."""
        ptrs = []
        upper = self.psize
        blob = bytearray(self.psize)
        for node in nodes:
            upper -= _even(len(node))
            blob[upper:upper + len(node)] = node
            ptrs.append(upper)
        lower = PAGEHDRSZ + 2 * len(nodes)
        assert lower <= upper, 'page overflow — split before packing'
        struct.pack_into('<QHHHH', blob, 0, pgno, 0, flags, lower, upper)
        for i, p in enumerate(ptrs):
            struct.pack_into('<H', blob, PAGEHDRSZ + 2 * i, p)
        return bytes(blob)

    def _leaf_node(self, key, value):
        if PAGEHDRSZ + 8 + len(key) + len(value) + 2 > self.psize // 2:
            # big data: value goes to overflow pages
            npages = -(-(PAGEHDRSZ + len(value)) // self.psize)
            ovf = self._alloc(npages)
            blob = bytearray(npages * self.psize)
            struct.pack_into('<QHHI', blob, 0, ovf, 0, 0x04, npages)
            blob[PAGEHDRSZ:PAGEHDRSZ + len(value)] = value
            for j in range(npages):
                self.pages[ovf + j] = bytes(
                    blob[j * self.psize:(j + 1) * self.psize])
            node = struct.pack('<HHHH', len(value) & 0xFFFF,
                               len(value) >> 16, 0x01, len(key))
            return node + key + struct.pack('<Q', ovf)
        node = struct.pack('<HHHH', len(value) & 0xFFFF, len(value) >> 16,
                           0, len(key))
        return node + key + value

    def _branch_node(self, key, child_pgno):
        return struct.pack('<HHHH', child_pgno & 0xFFFF,
                           (child_pgno >> 16) & 0xFFFF,
                           (child_pgno >> 32) & 0xFFFF, len(key)) + key

    def write(self, path, items):
        items = sorted(items)
        # pack leaves greedily
        leaves = []          # (first_key, pgno)
        cur_nodes, cur_size, cur_first = [], 0, None
        depth = 1

        def flush():
            nonlocal cur_nodes, cur_size, cur_first
            if cur_nodes:
                pgno = self._alloc()
                self.pages[pgno] = self._page_bytes(pgno, 0x02, cur_nodes)
                leaves.append((cur_first, pgno))
                cur_nodes, cur_size, cur_first = [], 0, None

        for k, v in items:
            node = self._leaf_node(k, v)
            need = _even(len(node)) + 2
            if cur_size + need > self.psize - PAGEHDRSZ:
                flush()
            if not cur_nodes:
                cur_first = k
            cur_nodes.append(node)
            cur_size += need
        flush()

        if not leaves:
            root = 0xFFFFFFFFFFFFFFFF
        elif len(leaves) == 1:
            root = leaves[0][1]
        else:
            # one branch level is plenty for the fixtures (reader recurses)
            depth = 2
            nodes = [self._branch_node(b'' if i == 0 else k, pg)
                     for i, (k, pg) in enumerate(leaves)]
            root = self._alloc()
            self.pages[root] = self._page_bytes(root, 0x01, nodes)

        meta = bytearray(self.psize)

        def pack_meta(buf, pgno, txnid):
            struct.pack_into('<QHHHH', buf, 0, pgno, 0, 0x08, 0, 0)
            o = PAGEHDRSZ
            struct.pack_into('<II', buf, o, MDB_MAGIC, 1)      # magic/version
            struct.pack_into('<QQ', buf, o + 8, 0, 1048576)    # address/mapsize
            struct.pack_into('<IHH', buf, o + 24, self.psize, 0, 0)  # dbs[0]
            struct.pack_into('<IHH', buf, o + 72, 0, 0, depth)  # dbs[1] head
            struct.pack_into('<QQQ', buf, o + 72 + 8, 0, len(leaves),
                             0)                                 # page counts
            struct.pack_into('<QQ', buf, o + 72 + 32, len(items), root)
            struct.pack_into('<QQ', buf, o + 120, self.next_pgno - 1, txnid)
            return buf

        with open(path, 'wb') as f:
            f.write(pack_meta(bytearray(self.psize), 0, txnid=1))
            f.write(pack_meta(bytearray(self.psize), 1, txnid=2))
            for pgno in range(2, self.next_pgno):
                f.write(self.pages[pgno])


def _write_env(tmp_path, items, name='env'):
    d = tmp_path / name
    d.mkdir()
    try:
        import lmdb  # golden writer when available

        env = lmdb.open(str(d), map_size=64 << 20)
        with env.begin(write=True) as txn:
            for k, v in items:
                txn.put(k, v)
        env.close()
    except ImportError:
        _Writer().write(str(d / 'data.mdb'), items)
    return str(d)


def test_single_leaf_roundtrip(tmp_path):
    items = [(f'key{i:03d}'.encode(), f'value-{i}'.encode() * 3)
             for i in range(10)]
    path = _write_env(tmp_path, items)
    with LMDBReader(path) as r:
        assert len(r) == 10
        assert list(r.items()) == sorted(items)


def test_multi_page_tree_in_key_order(tmp_path):
    # ~500 items × ~120B forces multiple leaves under a branch root
    items = [(b'%05d' % i, bytes([i % 251]) * 100) for i in range(500)]
    path = _write_env(tmp_path, items)
    with LMDBReader(path) as r:
        assert len(r) == 500
        got = list(r.items())
    assert got == sorted(items)


def test_overflow_value(tmp_path):
    big = os.urandom(3 * PSIZE + 123)  # spans 4 overflow pages
    items = [(b'big', big), (b'small', b'x')]
    path = _write_env(tmp_path, items)
    with LMDBReader(path) as r:
        got = dict(r.items())
    assert got[b'big'] == big
    assert got[b'small'] == b'x'


def test_empty_db(tmp_path):
    path = _write_env(tmp_path, [])
    with LMDBReader(path) as r:
        assert len(r) == 0
        assert list(r.items()) == []


def test_newer_meta_page_wins(tmp_path):
    # the writer stamps meta1 with the larger txnid; scribbling a bogus
    # root into meta0 must not affect reads
    items = [(b'a', b'1'), (b'b', b'2')]
    path = _write_env(tmp_path, items)
    data = os.path.join(path, 'data.mdb')
    with open(data, 'r+b') as f:
        f.seek(PAGEHDRSZ + 72 + 40)   # meta0 main-DB root
        f.write(struct.pack('<Q', 0xDEAD))
    with LMDBReader(path) as r:
        assert list(r.items()) == items


def test_rejects_non_lmdb_file(tmp_path):
    p = tmp_path / 'not.mdb'
    p.write_bytes(b'\x00' * 8192)
    with pytest.raises(LMDBFormatError, match='magic'):
        LMDBReader(str(p))


def test_rejects_dupsort_main_db(tmp_path):
    items = [(b'a', b'1')]
    path = _write_env(tmp_path, items)
    data = os.path.join(path, 'data.mdb')
    with open(data, 'r+b') as f:
        for off in (PAGEHDRSZ + 72 + 4, PSIZE + PAGEHDRSZ + 72 + 4):
            f.seek(off)                # main-DB md_flags ← MDB_DUPSORT
            f.write(struct.pack('<H', 0x04))
    with pytest.raises(LMDBFormatError, match='DUPSORT'):
        LMDBReader(path)


def test_dataset_tool_lmdb_source(tmp_path):
    """End-to-end: dataset_tool ingests an LMDB archive of encoded images
    without the lmdb package (reference dataset_tool.py:118-142)."""
    import io

    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(0)
    items = []
    for i in range(4):
        img = Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8))
        buf = io.BytesIO()
        img.save(buf, format='PNG')
        items.append((b'%08d' % i, buf.getvalue()))
    # plus one undecodable record the iterator must skip (reference
    # swallows decode errors, dataset_tool.py:139-140)
    items.append((b'zz-bad', b'not an image'))
    path = _write_env(tmp_path, items)

    from click.testing import CliRunner

    from montage_gan_tpu.cli.dataset_tool import main as dtool

    dest = str(tmp_path / 'out.zip')
    res = CliRunner().invoke(
        dtool, ['--source', path, '--dest', dest, '--source-type', 'lmdb'])
    assert res.exit_code == 0, res.output
    import zipfile

    with zipfile.ZipFile(dest) as zf:
        imgs = [n for n in zf.namelist() if n.endswith('.png')]
        assert len(imgs) == 4


def test_truncated_file_raises_not_silently_truncates(tmp_path):
    """A data.mdb cut mid-page (partial download) must raise, not yield
    clamped/truncated values that downstream image decoding would silently
    skip."""
    items = [(b'%03d' % i, bytes([i]) * 200) for i in range(60)]
    path = _write_env(tmp_path, items)
    data = os.path.join(path, 'data.mdb')
    size = os.path.getsize(data)
    with open(data, 'r+b') as f:
        f.truncate(size - PSIZE // 2)  # cut the last page in half
    with LMDBReader(path) as r:
        with pytest.raises(LMDBFormatError, match='truncated|out of range'):
            list(r.items())
