"""Word lists used by the dictionary phrase matcher.

STOPWORDS_EN / TERMINATION_TERMS_EN reproduce the reference's data files
(reference claimskg/data/stopwordsen.txt and termination_termsen.txt) —
these are corpus data, not code.  The matcher skips stopwords inside a
candidate span and hard-stops on termination terms (reference
claimskg/reconciler/recognizer/intersection_recognizers.py:238,258-263).

NLTK_STOPWORDS_EN is the standard public English stopword list (the
reference pulls it from ``nltk.corpus.stopwords`` for reconciliation text
normalization, reference claimskg/reconciler/__init__.py:12); embedded here
because nltk is not available in this environment.
"""

STOPWORDS_EN = [
    "of", "the", "a", "in", "through", "by", "while", "not", "-", "his",
    "he", "her", "it", "its", "my", "at", "their",
]

TERMINATION_TERMS_EN = [
    ",", ".", ";", "!", "?", ":", "or", "and", "thus", "consequently",
    "hence", "nor", "neither", "who", "whom", "which", "that", "these",
    "those", "one", "she", "he", "they", "the", "(", ")", "[", "]", "_",
    "^", "/", "+", "*", "&", ".", "%", "$", "#", "\"", "!", "|", "~",
    "¢", "¦", "§", "«",
]

# Standard NLTK English stopwords (public list, 179 entries).
NLTK_STOPWORDS_EN = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are", "was",
    "were", "be", "been", "being", "have", "has", "had", "having", "do",
    "does", "did", "doing", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've", "now",
    "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't",
    "couldn", "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn",
    "hadn't", "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't", "shan",
    "shan't", "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't",
    "won", "won't", "wouldn", "wouldn't",
]
