from chitu_tpu.kvcache.paged import (
    NativeBackedPageAllocator,
    PageAllocator,
    PagedKVCache,
    SlotAllocator,
)
