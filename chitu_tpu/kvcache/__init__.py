from chitu_tpu.kvcache.paged import PageAllocator, PagedKVCache, SlotAllocator
