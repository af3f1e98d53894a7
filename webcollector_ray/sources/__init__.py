from .pagestore import BroadcastPageStore, BucketedPageStore, build_bucketed_store  # noqa: F401
