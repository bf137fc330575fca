"""Wave-loop plans: the crawl engine state machine and its hook surface."""
