"""Input-side components: the deterministic synthetic web generator
(the ``input_hint`` pages table), seed lists, and the fixture DNS."""
