from .pages import (  # noqa: F401
    generate_pages,
    generate_robots,
    generate_seeds,
    url_for_page,
)
