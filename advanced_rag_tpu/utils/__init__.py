"""Host-side infra primitives: constants, exceptions, cache, breaker, pool."""
