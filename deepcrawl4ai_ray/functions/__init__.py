from . import extract, hashing, textstats, urlnorm  # noqa: F401
