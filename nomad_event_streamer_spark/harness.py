"""Verification-harness helpers shared by the library, the driver
simulator (``scripts/driver_sim.py``), and the test suite — library
code, importable without the ``tests`` tree on the path."""

from __future__ import annotations


def driver_canonicalize(pdf):
    """Reproduce the verification driver's pandas canonicalization: the
    driver fetches results through Arrow -> pandas (array<T> columns
    become numpy.ndarray cells) and sorts by ALL columns before hashing.
    Multi-column ``sort_values`` factorizes each column — ndarray cells
    raise ``TypeError: unhashable type: 'numpy.ndarray'`` and the driver
    records a hard FAIL regardless of values (the r03
    q_dedup_survivorship / q_inverted_index failure mode).  This helper
    must throw exactly where the driver throws."""
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
