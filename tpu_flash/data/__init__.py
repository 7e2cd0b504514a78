"""Data pipelines (MT dataset, tokenizer, collation)."""

from tpu_flash.data import mt  # noqa: F401
