"""Fact-check source -> homepage dimension (reference
claimskg/generator/__init__.py:34-46).  Unknown sources are out-of-domain
(the reference raises KeyError); we model this as an inner broadcast join.
"""

SOURCE_URI_DICT = {
    "": "",
    "snopes": "http://www.snopes.com",
    "politifact": "http://www.politifact.com",
    "africacheck": "https://africacheck.org",
    "truthorfiction": "https://www.truthorfiction.com",
    "checkyourfact": "http://checkyourfact.com",
    "factscan": "http://factscan.ca",
    "factcheck_aap": "https://factcheck.aap.com.au",
    "factuel_afp_fr": "https://factuel.afp.com/",
    "factcheck_afp": "https://factcheck.afp.com/",
    "fullfact": "https://fullfact.org/",
}

KNOWN_SOURCES = [s for s in SOURCE_URI_DICT if s]
