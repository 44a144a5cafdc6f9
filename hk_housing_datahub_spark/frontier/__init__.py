from .crawl import CrawlEngine, CrawlResult  # noqa: F401
from .publish import PublishResult, publish_crawl  # noqa: F401
from .scheduler import schedule_wave  # noqa: F401
from .seen import BloomSeenSet, ExactSeenSet  # noqa: F401
