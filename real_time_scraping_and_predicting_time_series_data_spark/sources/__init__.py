"""Source / sink adapters replacing the reference's scraper + CSV I/O."""
