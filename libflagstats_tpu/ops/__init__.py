from .dispatch import flagstats_u16, get_function, pospopcnt_u16  # noqa: F401
from .xla_ops import flagstat_xla, pospopcnt_u16_xla, transform_words_jnp  # noqa: F401
