from .passage_store import NativePassageStore, native_available  # noqa: F401
