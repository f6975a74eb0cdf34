"""Crawl state: URL-seen / content-dup bitsets (Larbin's hashTable /
hashDup) and the host+IP scheduler state machine (NamedSite / IPSite)."""
