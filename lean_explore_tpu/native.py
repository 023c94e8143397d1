"""ctypes bindings for the lexcore native library (native/lexcore.cpp).

The library accelerates the host-side lexical path (BM25 CSR scoring, top-k
selection). Loading is best-effort: when the .so is absent or broken every
caller transparently uses the numpy implementations, so the native layer is
an optimization, never a requirement.

Build with ``make -C native`` (g++ only; no Python build deps).
"""

import ctypes
import logging
import os
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_LIB_CANDIDATES = [
    Path(__file__).resolve().parent.parent / "native" / "liblexcore.so",
    Path(os.environ.get("LEAN_EXPLORE_LEXCORE", "")),
]

_lib = None
_load_attempted = False


def load_lexcore() -> ctypes.CDLL | None:
    """Load and memoize the library; None when unavailable/disabled."""
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("LEAN_EXPLORE_NO_NATIVE"):
        return None
    for candidate in _LIB_CANDIDATES:
        if not candidate or not candidate.exists():
            continue
        try:
            lib = ctypes.CDLL(str(candidate))
        except OSError as error:
            logger.warning("failed to load lexcore at %s: %s", candidate, error)
            continue
        _configure(lib)
        _lib = lib
        logger.info("lexcore loaded from %s", candidate)
        break
    return _lib


def _configure(lib: ctypes.CDLL) -> None:
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.le_bm25_score.argtypes = [
        i64p, i32p, f32p, f64p,
        ctypes.c_int64, ctypes.c_double, f64p,
        i64p, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int32, f64p,
    ]
    lib.le_bm25_score.restype = None
    lib.le_topk.argtypes = [f64p, ctypes.c_int64, ctypes.c_int64, i64p, f64p]
    lib.le_topk.restype = None
    lib.le_tokenize_spaced.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64,
        i64p, ctypes.c_int64,
    ]
    lib.le_tokenize_spaced.restype = ctypes.c_int64
    lib.le_version.restype = ctypes.c_char_p


def _ptr(array: np.ndarray, ctype):
    return array.ctypes.data_as(ctypes.POINTER(ctype))


_METHOD_CODES = {"bm25+": 0, "lucene": 1, "robertson": 2}


def bm25_score_native(
    indptr: np.ndarray,
    doc_indices: np.ndarray,
    tf_values: np.ndarray,
    doc_lengths: np.ndarray,
    avgdl: float,
    idf: np.ndarray,
    query_token_ids: np.ndarray,
    k1: float,
    b: float,
    delta: float,
    method: str,
) -> np.ndarray | None:
    """Native BM25 scoring; None when the library is unavailable."""
    lib = load_lexcore()
    if lib is None:
        return None
    n_docs = doc_lengths.shape[0]
    scores = np.zeros(n_docs, dtype=np.float64)
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    doc_indices = np.ascontiguousarray(doc_indices, dtype=np.int32)
    tf_values = np.ascontiguousarray(tf_values, dtype=np.float32)
    doc_lengths = np.ascontiguousarray(doc_lengths, dtype=np.float64)
    idf = np.ascontiguousarray(idf, dtype=np.float64)
    query_token_ids = np.ascontiguousarray(query_token_ids, dtype=np.int64)
    lib.le_bm25_score(
        _ptr(indptr, ctypes.c_int64),
        _ptr(doc_indices, ctypes.c_int32),
        _ptr(tf_values, ctypes.c_float),
        _ptr(doc_lengths, ctypes.c_double),
        ctypes.c_int64(n_docs),
        ctypes.c_double(avgdl),
        _ptr(idf, ctypes.c_double),
        _ptr(query_token_ids, ctypes.c_int64),
        ctypes.c_int64(len(query_token_ids)),
        ctypes.c_double(k1),
        ctypes.c_double(b),
        ctypes.c_double(delta),
        ctypes.c_int32(_METHOD_CODES[method]),
        _ptr(scores, ctypes.c_double),
    )
    return scores


def tokenize_spaced_native(text: str) -> list[str] | None:
    """Native spaced tokenizer (ASCII fast path); None when unavailable or
    the text is non-ASCII (the Python regex path handles unicode)."""
    lib = load_lexcore()
    if lib is None or not text.isascii():
        return None
    raw = text.encode("ascii")
    out = ctypes.create_string_buffer(2 * len(raw) + 2)
    starts = np.zeros(len(raw) + 1, dtype=np.int64)
    n = lib.le_tokenize_spaced(
        raw,
        ctypes.c_int64(len(raw)),
        out,
        ctypes.c_int64(len(out)),
        _ptr(starts, ctypes.c_int64),
        ctypes.c_int64(len(starts)),
    )
    if n < 0:
        return None
    buf = out.raw
    tokens = []
    for i in range(n):
        start = int(starts[i])
        end = buf.index(b"\0", start)
        tokens.append(buf[start:end].decode("ascii"))
    return tokens


def topk_native(
    scores: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """Native top-k (descending, ties by index); None when unavailable."""
    lib = load_lexcore()
    if lib is None:
        return None
    scores = np.ascontiguousarray(scores, dtype=np.float64)
    k = min(k, scores.shape[0])
    out_idx = np.zeros(k, dtype=np.int64)
    out_scores = np.zeros(k, dtype=np.float64)
    lib.le_topk(
        _ptr(scores, ctypes.c_double),
        ctypes.c_int64(scores.shape[0]),
        ctypes.c_int64(k),
        _ptr(out_idx, ctypes.c_int64),
        _ptr(out_scores, ctypes.c_double),
    )
    return out_idx, out_scores
