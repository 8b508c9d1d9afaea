"""Host-side infra primitives: constants, exceptions, cache, breaker,
pool, rate limiter."""

from .circuit_breaker import (
    CircuitBreaker,
    CircuitBreakerConfig,
    CircuitState,
    with_circuit_breaker,
)
from .db_pool import DatabasePool, close_pool, get_pool, initialize_pool
from .rate_limit import RateLimiter

__all__ = [
    "CircuitBreaker",
    "CircuitBreakerConfig",
    "CircuitState",
    "DatabasePool",
    "RateLimiter",
    "close_pool",
    "get_pool",
    "initialize_pool",
    "with_circuit_breaker",
]
