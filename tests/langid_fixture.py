"""Labeled natural-language accuracy fixture for functions/langid.py.

VERDICT r4 next-round #5: the operator's evidence must be an accuracy
property over labeled real text, not the self-validating `ok` column.
Sentences are short original prose (everyday/administrative register —
the register web text actually carries), 5 per language across all 16
supported languages, written for this fixture; no external data.

The fixture deliberately includes the hard cases: Latin-script languages
that share function words (es/pt/it, de/nl) and the Han-script overlap
(zh vs ja). tests/test_langid.py computes per-language accuracy and the
full confusion matrix over DEMO_SENTENCES + EXTRA_SAMPLES + this fixture.
"""

from __future__ import annotations

ACCURACY_SENTENCES: dict[str, list[str]] = {
    "en": [
        "The library closes early on Friday because of the holiday.",
        "She asked whether the train would arrive before noon.",
        "Most of the students had already finished their homework.",
        "The weather this morning was colder than we expected.",
        "He could not remember where he had left the keys.",
    ],
    "de": [
        "Die Bibliothek schließt am Freitag wegen des Feiertags früher.",
        "Sie fragte, ob der Zug vor Mittag ankommen würde.",
        "Die meisten Studenten hatten ihre Hausaufgaben schon beendet.",
        "Das Wetter war heute Morgen kälter, als wir erwartet hatten.",
        "Er konnte sich nicht erinnern, wo er die Schlüssel gelassen hatte.",
    ],
    "fr": [
        "La bibliothèque ferme plus tôt vendredi à cause du jour férié.",
        "Elle a demandé si le train arriverait avant midi.",
        "La plupart des étudiants avaient déjà fini leurs devoirs.",
        "Le temps ce matin était plus froid que nous ne le pensions.",
        "Il ne se souvenait plus où il avait laissé les clés.",
    ],
    "es": [
        "La biblioteca cierra más temprano el viernes por el día festivo.",
        "Ella preguntó si el tren llegaría antes del mediodía.",
        "La mayoría de los estudiantes ya habían terminado sus deberes.",
        "El tiempo esta mañana era más frío de lo que esperábamos.",
        "Él no podía recordar dónde había dejado las llaves.",
    ],
    "pt": [
        "A biblioteca fecha mais cedo na sexta-feira por causa do feriado.",
        "Ela perguntou se o trem chegaria antes do meio-dia.",
        "A maioria dos estudantes já tinha terminado os deveres de casa.",
        "O tempo esta manhã estava mais frio do que esperávamos.",
        "Ele não conseguia lembrar onde tinha deixado as chaves.",
    ],
    "it": [
        "La biblioteca chiude prima venerdì a causa della festività.",
        "Lei ha chiesto se il treno sarebbe arrivato prima di mezzogiorno.",
        "La maggior parte degli studenti aveva già finito i compiti.",
        "Il tempo questa mattina era più freddo di quanto ci aspettassimo.",
        "Lui non riusciva a ricordare dove avesse lasciato le chiavi.",
    ],
    "nl": [
        "De bibliotheek sluit vrijdag eerder vanwege de feestdag.",
        "Ze vroeg of de trein voor twaalf uur zou aankomen.",
        "De meeste studenten hadden hun huiswerk al afgemaakt.",
        "Het weer was vanochtend kouder dan we hadden verwacht.",
        "Hij kon zich niet herinneren waar hij de sleutels had gelaten.",
    ],
    "ru": [
        "Библиотека закрывается раньше в пятницу из-за праздника.",
        "Она спросила, придёт ли поезд до полудня.",
        "Большинство студентов уже закончили домашнее задание.",
        "Погода этим утром была холоднее, чем мы ожидали.",
        "Он не мог вспомнить, где оставил ключи.",
    ],
    "el": [
        "Η βιβλιοθήκη κλείνει νωρίτερα την Παρασκευή λόγω της αργίας.",
        "Ρώτησε αν το τρένο θα έφτανε πριν από το μεσημέρι.",
        "Οι περισσότεροι φοιτητές είχαν ήδη τελειώσει τις εργασίες τους.",
        "Ο καιρός σήμερα το πρωί ήταν πιο κρύος από ό,τι περιμέναμε.",
        "Δεν μπορούσε να θυμηθεί πού είχε αφήσει τα κλειδιά.",
    ],
    "ar": [
        "تغلق المكتبة أبوابها مبكرا يوم الجمعة بسبب العطلة.",
        "سألت عما إذا كان القطار سيصل قبل الظهر.",
        "كان معظم الطلاب قد أنهوا واجباتهم المنزلية بالفعل.",
        "كان الطقس هذا الصباح أبرد مما توقعنا.",
        "لم يستطع أن يتذكر أين ترك المفاتيح.",
    ],
    "he": [
        "הספרייה נסגרת מוקדם ביום שישי בגלל החג.",
        "היא שאלה אם הרכבת תגיע לפני הצהריים.",
        "רוב הסטודנטים כבר סיימו את שיעורי הבית שלהם.",
        "מזג האוויר הבוקר היה קר יותר ממה שציפינו.",
        "הוא לא זכר איפה השאיר את המפתחות.",
    ],
    "th": [
        "ห้องสมุดปิดเร็วขึ้นในวันศุกร์เนื่องจากวันหยุด",
        "เธอถามว่ารถไฟจะมาถึงก่อนเที่ยงหรือไม่",
        "นักเรียนส่วนใหญ่ทำการบ้านเสร็จแล้ว",
        "อากาศเช้านี้หนาวกว่าที่เราคาดไว้",
        "เขาจำไม่ได้ว่าวางกุญแจไว้ที่ไหน",
    ],
    "hi": [
        "छुट्टी के कारण पुस्तकालय शुक्रवार को जल्दी बंद हो जाता है।",
        "उसने पूछा कि क्या ट्रेन दोपहर से पहले आ जाएगी।",
        "अधिकांश छात्रों ने अपना गृहकार्य पहले ही पूरा कर लिया था।",
        "आज सुबह मौसम हमारी उम्मीद से ज़्यादा ठंडा था।",
        "उसे याद नहीं आ रहा था कि चाबियाँ कहाँ छोड़ी थीं।",
    ],
    "zh": [
        "由于假期，图书馆星期五提前关门。",
        "她问火车是否会在中午之前到达。",
        "大多数学生已经完成了他们的作业。",
        "今天早上的天气比我们预期的要冷。",
        "他不记得把钥匙放在哪里了。",
    ],
    "ja": [
        "祝日のため、図書館は金曜日に早く閉まります。",
        "彼女は電車が正午前に着くかどうか尋ねました。",
        "ほとんどの学生はすでに宿題を終えていました。",
        "今朝の天気は予想よりも寒かったです。",
        "彼は鍵をどこに置いたか思い出せませんでした。",
    ],
    "ko": [
        "휴일 때문에 도서관은 금요일에 일찍 문을 닫습니다.",
        "그녀는 기차가 정오 전에 도착할지 물었습니다.",
        "대부분의 학생들은 이미 숙제를 끝냈습니다.",
        "오늘 아침 날씨는 우리가 예상했던 것보다 추웠습니다.",
        "그는 열쇠를 어디에 두었는지 기억하지 못했습니다.",
    ],
}
