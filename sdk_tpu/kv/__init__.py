"""Key-value plane above the Spiral PIR rows (reference
lib/spiral-rs/src/key_value.rs + lib/server/src/db/write.rs)."""

from .key_value import row_from_key, hash_key, extract_result
from .write import update_row, unwrap_kv_pairs

__all__ = ["row_from_key", "hash_key", "extract_result", "update_row",
           "unwrap_kv_pairs"]
