"""LRU cache unit tests, ported from tokenizer_ts/test/lru.test.ts:7-51."""

from tokenizer_tpu.utils.lru import LRUCache


def test_get_set():
    c = LRUCache(2)
    c.set("a", 1)
    c.set("b", 2)
    assert c.get("a") == 1
    assert c.get("b") == 2
    assert c.get("c") is None


def test_update_existing():
    c = LRUCache(2)
    c.set("a", 1)
    c.set("a", 9)
    assert c.get("a") == 9
    assert len(c) == 1


def test_eviction_order():
    c = LRUCache(2)
    c.set("a", 1)
    c.set("b", 2)
    c.set("c", 3)  # evicts "a"
    assert c.get("a") is None
    assert c.get("b") == 2
    assert c.get("c") == 3


def test_get_refreshes_recency():
    c = LRUCache(2)
    c.set("a", 1)
    c.set("b", 2)
    assert c.get("a") == 1  # refresh "a" → "b" is now LRU
    c.set("c", 3)
    assert c.get("b") is None
    assert c.get("a") == 1
    assert c.get("c") == 3


def test_lookup_add_aliases():
    c = LRUCache(4)
    found, v = c.lookup("x")
    assert not found and v is None
    c.add("x", [1, 2])
    found, v = c.lookup("x")
    assert found and v == [1, 2]
