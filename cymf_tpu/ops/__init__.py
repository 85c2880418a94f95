from .segment import dedup_rows, csr_contains, csr_lookup

__all__ = ["dedup_rows", "csr_contains", "csr_lookup"]
